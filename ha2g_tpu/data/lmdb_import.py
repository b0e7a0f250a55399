"""Importer from the reference's lmdb datasets.

The released TED Gesture / TED Expressive datasets are lmdb stores of
pyarrow-0.14 legacy-serialized per-video clip records (reference
lmdb_data_loader.py:108-115, data_preprocessor.py:41-56; the format is
documented in SURVEY.md section 2.10).  This converter reads them into the
framework's npz clip storage (ha2g_tpu/data/storage.py).

Both format layers are self-contained: when the optional `lmdb` package /
a legacy pyarrow (<=0.17, exposing `pyarrow.deserialize`) are absent, the
pure-Python implementations in lmdb_mini.py and pyarrow_legacy.py read the
reference bytes directly — no extra environment needed."""

from __future__ import annotations

from pathlib import Path


def _open_lmdb_items(lmdb_dir: str):
    """Yield (key, value-bytes) from an LMDB environment, preferring the
    real `lmdb` package, falling back to the pure-Python reader."""
    try:
        import lmdb  # type: ignore

        def gen():
            env = lmdb.open(lmdb_dir, readonly=True, lock=False)
            try:
                with env.begin(write=False) as txn:
                    for key, value in txn.cursor():
                        yield key, value
            finally:
                env.close()
        return gen()
    except ImportError:
        from ha2g_tpu.data.lmdb_mini import MiniLmdbReader
        return MiniLmdbReader(lmdb_dir).items()


def _deserializer():
    """pyarrow legacy `deserialize`: the real one when this env carries
    pyarrow<=0.17, else the re-implemented codec."""
    try:
        import pyarrow  # type: ignore
        return pyarrow.deserialize  # removed in pyarrow >= 1.0
    except (ImportError, AttributeError):
        from ha2g_tpu.data.pyarrow_legacy import deserialize
        return deserialize


def import_lmdb(lmdb_dir: str, out_dir: str, limit: int | None = None) -> int:
    """Convert a *source* (per-video) reference lmdb into clip storage.

    Returns the number of clips written."""
    if not Path(lmdb_dir).exists():
        raise FileNotFoundError(lmdb_dir)
    deserialize = _deserializer()
    from ha2g_tpu.data.storage import save_clips

    clips = []
    for key, value in _open_lmdb_items(lmdb_dir):
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
    save_clips(out_dir, clips)
    return len(clips)


def write_reference_lmdb(lmdb_dir: str, videos: list[dict]):
    """Emit a *reference-format* source lmdb (keys '{:010}'.format(idx),
    values pyarrow-0.14-serialized {vid, clips} records) — the byte
    format make_ted_dataset.py:215-220 produces.  Used to build fixtures
    and to export data back into the reference's own tooling."""
    from ha2g_tpu.data.lmdb_mini import write_lmdb
    from ha2g_tpu.data.pyarrow_legacy import serialize
    records = {f"{i:010}".encode("ascii"): serialize(v)
               for i, v in enumerate(videos)}
    return write_lmdb(lmdb_dir, records)
