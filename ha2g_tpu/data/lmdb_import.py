"""Importer from the reference's lmdb datasets.

The released TED Gesture / TED Expressive datasets are lmdb stores of
pyarrow-0.14 legacy-serialized per-video clip records (reference
lmdb_data_loader.py:108-115, data_preprocessor.py:41-56; the format is
documented in SURVEY.md section 2.10).  This converter reads them into the
framework's npz clip storage (ha2g_tpu/data/storage.py).

Requires the optional `lmdb` and a pyarrow old enough to expose
`pyarrow.deserialize` (<= 0.17); both are import-gated so the framework has
no hard dependency on them.
"""

from __future__ import annotations



def import_lmdb(lmdb_dir: str, out_dir: str, limit: int | None = None) -> int:
    """Convert a *source* (per-video) reference lmdb into clip storage.

    Returns the number of clips written.  Raises ImportError with guidance
    when lmdb/pyarrow are unavailable.
    """
    try:
        import lmdb  # type: ignore
    except ImportError as e:
        raise ImportError(
            "importing reference datasets needs the `lmdb` package "
            "(pip install lmdb) — not bundled with ha2g_tpu") from e
    try:
        import pyarrow  # type: ignore
        deserialize = pyarrow.deserialize  # removed in pyarrow >= 1.0
    except (ImportError, AttributeError) as e:
        raise ImportError(
            "the reference lmdb uses pyarrow<=0.17 legacy serialization; "
            "run this converter in an env with pyarrow==0.14") from e

    from ha2g_tpu.data.storage import save_clips

    env = lmdb.open(lmdb_dir, readonly=True, lock=False)
    clips = []
    with env.begin(write=False) as txn:
        for key, value in txn.cursor():
            video = deserialize(value)
            vid = video["vid"]
            for clip in video["clips"]:
                clips.append({
                    "vid": vid,
                    "skeletons_3d": clip["skeletons_3d"],
                    "audio_raw": clip["audio_raw"],
                    "audio_spec": clip.get("audio_feat"),
                    "words": [tuple(w) for w in clip["words"]],
                    "start_time": float(clip["start_time"]),
                    "end_time": float(clip["end_time"]),
                    "start_frame_no": int(clip["start_frame_no"]),
                    "end_frame_no": int(clip["end_frame_no"]),
                })
                if limit and len(clips) >= limit:
                    break
            if limit and len(clips) >= limit:
                break
    env.close()
    save_clips(out_dir, clips)
    return len(clips)
