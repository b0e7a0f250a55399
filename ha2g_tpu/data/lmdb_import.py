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


def import_cache_lmdb(lmdb_dir: str, out_dir: str, n_poses: int = 34,
                      fps: int = 15, max_words: int = 32,
                      remove_word_timing: bool = False,
                      limit: int | None = None) -> int:
    """Convert a *preprocessed cache* lmdb (per-sample records, the
    `lmdb_*_cache` directories the reference driver builds and sometimes
    ships) straight into fixed-shape WindowedSamples + vocabs.

    Cache record layout (data_preprocessor.py:150-165):
    [words, poses, normalized_dir_vec, audio, spectrogram, aux_info] with
    aux_info {vid, start_frame_no, end_frame_no, start_time, end_time};
    the dir vecs are already mean-subtracted.  The __getitem__-stage
    clipping and both text encodings (lmdb_data_loader.py:116-166) are
    reproduced here at conversion time.

    Writes <out_dir>/{samples.npz, vocab.json, speaker.json}; returns the
    sample count."""
    import json
    import math

    import numpy as np

    from ha2g_tpu.data.dataset import (WindowedSamples,
                                       spectrogram_length_for)
    from ha2g_tpu.data.vocab import EOS_TOKEN, SOS_TOKEN, Vocab

    if not Path(lmdb_dir).exists():
        raise FileNotFoundError(lmdb_dir)
    deserialize = _deserializer()

    records = []
    for _key, value in _open_lmdb_items(lmdb_dir):
        records.append(deserialize(value))
        if limit and len(records) >= limit:
            break

    # pass 1: vocabularies
    lang = Vocab("words")
    speaker = Vocab("vid", insert_default_tokens=False)
    for words, *_rest, aux in records:
        for w in words:
            lang.index_word(w[0])
        speaker.index_word(aux["vid"])

    audio_len = int(round(n_poses / fps * 16000))
    spec_len = spectrogram_length_for(n_poses, fps)
    rows = {k: [] for k in ("text", "word_seq", "pose", "target", "audio",
                            "spec", "vids")}
    for words, poses, vec_seq, audio, spectrogram, aux in records:
        poses = np.asarray(poses, np.float32)
        vec_seq = np.asarray(vec_seq, np.float32)
        audio = np.asarray(audio, np.float32)
        spectrogram = np.asarray(spectrogram, np.float32)
        duration = float(aux["end_time"]) - float(aux["start_time"])
        # do_clipping (lmdb_data_loader.py:154-162)
        sample_end_time = float(aux["start_time"]) + \
            duration * n_poses / vec_seq.shape[0]
        if len(audio) < audio_len:
            audio = np.pad(audio, (0, audio_len - len(audio)),
                           mode="symmetric")
        audio = audio[:audio_len]
        spectrogram = spectrogram[:, :spec_len]
        vec_seq = vec_seq[:n_poses]
        poses = poses[:n_poses]

        frame_duration = (sample_end_time - float(aux["start_time"])) \
            / n_poses
        ext = np.zeros(n_poses, np.int32)
        if remove_word_timing:
            inside = [w for w in words if int(np.floor(
                (w[1] - aux["start_time"]) / frame_duration)) < n_poses]
            space = int(n_poses / (len(inside) + 1))
            for k, w in enumerate(inside):
                ext[(k + 1) * space] = lang.get_word_index(w[0])
        else:
            for w in words:
                idx = max(0, int(np.floor(
                    (w[1] - aux["start_time"]) / frame_duration)))
                if idx < n_poses:
                    ext[idx] = lang.get_word_index(w[0])
        seq = [SOS_TOKEN]
        for w in words:
            if w[1] > sample_end_time:
                break
            seq.append(lang.get_word_index(w[0]))
        # cap long windows but always keep the EOS terminator (the
        # reference's words_to_tensor is uncapped; seq2seq/joint-embed
        # consumers rely on a trailing EOS)
        seq = seq[:max_words - 1] + [EOS_TOKEN]

        rows["text"].append(ext)
        rows["word_seq"].append(np.asarray(seq, np.int32))
        rows["pose"].append(poses.reshape(n_poses, -1))
        rows["target"].append(vec_seq.reshape(n_poses, -1))
        rows["audio"].append(audio)
        rows["spec"].append(spectrogram)
        rows["vids"].append(speaker.get_word_index(aux["vid"]))

    n = len(rows["text"])
    if n == 0:
        raise ValueError(f"no samples in {lmdb_dir}")
    lengths = np.asarray([len(s) for s in rows["word_seq"]], np.int32)
    mw = max(int(lengths.max()), 2)
    word_seq = np.zeros((n, mw), np.int32)
    for i, s in enumerate(rows["word_seq"]):
        word_seq[i, :len(s)] = s
    samples = WindowedSamples(
        text=np.stack(rows["text"]), word_seq=word_seq,
        word_lengths=lengths, pose=np.stack(rows["pose"]),
        target=np.stack(rows["target"]), audio=np.stack(rows["audio"]),
        spec=np.stack(rows["spec"]),
        vids=np.asarray(rows["vids"], np.int32))

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out / "samples.npz",
        **{k: getattr(samples, k) for k in
           ("text", "word_seq", "word_lengths", "pose", "target",
            "audio", "spec", "vids")})
    lang.save(out / "vocab.json")
    speaker.save(out / "speaker.json")
    return n


def load_imported_samples(path: str | Path):
    """Load an import_cache_lmdb output directory ->
    (WindowedSamples, lang Vocab, speaker Vocab)."""
    from ha2g_tpu.data.dataset import WindowedSamples
    from ha2g_tpu.data.vocab import Vocab
    import numpy as np

    path = Path(path)
    z = np.load(path / "samples.npz")
    samples = WindowedSamples(**{k: z[k] for k in z.files})
    return (samples, Vocab.load(path / "vocab.json"),
            Vocab.load(path / "speaker.json"))
