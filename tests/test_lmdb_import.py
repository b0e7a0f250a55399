"""Reference-format lmdb ingestion, executed end to end against
reference-format bytes.

Builds a byte-faithful mini dataset in the reference's own wire format —
an LMDB environment (lmdb_mini.py implements liblmdb's stable on-disk
layout) whose values are pyarrow-0.14 legacy-serialized {vid, clips}
records (pyarrow_legacy.py; make_ted_dataset.py:215-220 is the writer
being mirrored, lmdb_data_loader.py:108-115 / data_preprocessor.py:41-56
the readers) — then drives the real converter + windowing + batching over
it."""

import struct

import numpy as np
import pytest

from ha2g_tpu.data import pyarrow_legacy as pal
from ha2g_tpu.data.lmdb_import import import_lmdb, write_reference_lmdb
from ha2g_tpu.data.lmdb_mini import (MiniLmdbReader, write_lmdb, MAGIC,
                                     NODEMAX, P_INVALID, PAGE)
from ha2g_tpu.data.synthetic import default_mean_dir_vec, synthetic_clips
from ha2g_tpu.skeleton import TED_GESTURE


# ---------------------------------------------------------------------------
# pyarrow-0.14 legacy codec
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("obj", [
    None, True, False, 7, -3, 2.5, "héllo", b"raw", [1, "a", 2.0],
    (1, 2), {"k": 1, 2: "v"}, [], {}, [[1, [2, [3, None]]]],
    {"nested": {"arrays": [np.arange(5), np.eye(2, dtype=np.float32)]}},
])
def test_legacy_codec_round_trip(obj):
    got = pal.deserialize(pal.serialize(obj))
    if isinstance(obj, dict) and "nested" in obj:
        np.testing.assert_array_equal(
            got["nested"]["arrays"][0], obj["nested"]["arrays"][0])
        np.testing.assert_array_equal(
            got["nested"]["arrays"][1], obj["nested"]["arrays"][1])
    else:
        assert got == obj and type(got) is type(obj)


def test_legacy_codec_float32_scalar_round_trips_as_float32():
    got = pal.deserialize(pal.serialize(np.float32(1.25)))
    assert isinstance(got, np.float32) and got == np.float32(1.25)


def test_legacy_codec_wire_layout():
    """The three-int32 component header, 8-aligned stream, 64-aligned
    legacy tensor messages (SerializedPyObject::WriteTo)."""
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    buf = pal.serialize({"x": arr})
    nt, nnd, nb = struct.unpack_from("<iii", buf)
    assert (nt, nnd, nb) == (0, 1, 0)
    # the IPC stream must start right after padding, in the LEGACY
    # envelope: an int32 length, NOT the 0xFFFFFFFF continuation marker
    assert buf[12:16] == b"\x00" * 4            # pad 12 -> 16
    assert buf[16:20] != b"\xff\xff\xff\xff"
    assert struct.unpack_from("<i", buf, 16)[0] > 0
    # tensor message: 64-aligned, legacy envelope
    import pyarrow as pa
    reader = pa.BufferReader(buf[16:])
    stream = pa.ipc.open_stream(reader)
    list(stream)
    pos = 16 + reader.tell()
    pos += (-pos) % 64
    assert buf[pos:pos + 4] != b"\xff\xff\xff\xff"
    t = pa.ipc.read_tensor(pa.BufferReader(buf[pos:]))
    np.testing.assert_array_equal(t.to_numpy(), arr)


def test_legacy_codec_preserves_dtypes():
    for dtype in (np.float32, np.float64, np.int16, np.int64, np.uint8):
        arr = np.arange(6, dtype=dtype)
        got = pal.deserialize(pal.serialize(arr))
        assert got.dtype == dtype
        np.testing.assert_array_equal(got, arr)


def test_legacy_codec_rejects_object_arrays():
    with pytest.raises(TypeError):
        pal.serialize(np.array([object()]))


# ---------------------------------------------------------------------------
# LMDB on-disk format
# ---------------------------------------------------------------------------

def test_lmdb_round_trip_with_overflow_and_branches(tmp_path):
    rng = np.random.default_rng(0)
    records = {f"{i:010d}".encode(): bytes(rng.bytes(
        30000 if i % 5 == 0 else 100 + i)) for i in range(200)}
    write_lmdb(tmp_path / "db", records)
    r = MiniLmdbReader(tmp_path / "db")
    assert r.stat()["entries"] == 200
    got = {k: bytes(v) for k, v in r.items()}
    assert got == records
    assert list(got) == sorted(records)  # key order


def test_lmdb_meta_layout(tmp_path):
    """Struct-level spot checks of the data file against liblmdb's
    layout: magic/version at meta+16, main-db entries, last page."""
    path = write_lmdb(tmp_path / "db", {b"k": b"v"})
    raw = path.read_bytes()
    for meta_page in (0, 1):
        off = meta_page * PAGE + 16
        magic, version = struct.unpack_from("<II", raw, off)
        assert magic == MAGIC and version == 1
    # live meta is page 1 (txnid 1); main DB at +72: entries=1, root valid
    entries, root = struct.unpack_from("<QQ", raw, PAGE + 16 + 72 + 32)
    assert entries == 1 and root != P_INVALID
    # page header of the root leaf: flags P_LEAF at +10
    flags, = struct.unpack_from("<H", raw, root * PAGE + 10)
    assert flags & 0x2


def test_lmdb_value_at_nodemax_boundary(tmp_path):
    # largest in-page value vs smallest overflow value
    key = b"0000000001"
    for dlen in (NODEMAX - 8 - len(key), NODEMAX - 8 - len(key) + 1):
        records = {key: b"x" * dlen}
        write_lmdb(tmp_path / f"db{dlen}", records)
        r = MiniLmdbReader(tmp_path / f"db{dlen}")
        assert bytes(r.get(key)) == records[key]


# ---------------------------------------------------------------------------
# the full ingest path
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reference_format_lmdb(tmp_path_factory):
    """A mini source lmdb in the reference's exact wire format."""
    tmp = tmp_path_factory.mktemp("ref_lmdb")
    clips = synthetic_clips(TED_GESTURE, n_clips=6,
                            clip_seconds=6.0, n_speakers=3, seed=11)
    videos = []
    for i in range(3):  # two clips per video record
        videos.append({
            "vid": f"vid_{i}",
            "clips": [{
                "words": [list(w) for w in c["words"]],
                "skeletons_3d": c["skeletons_3d"],
                "audio_feat": np.zeros((128, 10), np.float32),
                "audio_raw": c["audio_raw"],
                "start_frame_no": c["start_frame_no"],
                "end_frame_no": c["end_frame_no"],
                "start_time": c["start_time"],
                "end_time": c["end_time"],
            } for c in clips[2 * i:2 * i + 2]],
        })
    write_reference_lmdb(tmp / "lmdb_train", videos)
    return tmp / "lmdb_train", videos


def test_import_lmdb_end_to_end(reference_format_lmdb, tmp_path):
    lmdb_dir, videos = reference_format_lmdb
    n = import_lmdb(str(lmdb_dir), str(tmp_path / "clips"))
    assert n == 6
    from ha2g_tpu.data.storage import load_clips
    clips = load_clips(tmp_path / "clips")
    assert [c["vid"] for c in clips] == ["vid_0", "vid_0", "vid_1",
                                        "vid_1", "vid_2", "vid_2"]
    src = videos[0]["clips"][0]
    np.testing.assert_array_equal(clips[0]["skeletons_3d"],
                                  src["skeletons_3d"])
    np.testing.assert_array_equal(clips[0]["audio_raw"], src["audio_raw"])
    assert clips[0]["words"] == [tuple(w) for w in src["words"]]
    assert clips[0]["end_frame_no"] == src["end_frame_no"]


def test_import_lmdb_to_batch(reference_format_lmdb, tmp_path):
    """import_lmdb -> window_clips -> BatchLoader: the full data path the
    reference drives from its released lmdb files."""
    lmdb_dir, _ = reference_format_lmdb
    import_lmdb(str(lmdb_dir), str(tmp_path / "clips"))
    from ha2g_tpu.data.dataset import window_clips
    from ha2g_tpu.data.loader import BatchLoader
    from ha2g_tpu.data.storage import load_clips
    from ha2g_tpu.data.vocab import Vocab, build_vocab

    clips = load_clips(tmp_path / "clips")
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    spec = TED_GESTURE
    mean_vec = default_mean_dir_vec(spec)
    samples = window_clips(
        clips, spec=spec, lang=lang, speaker=speaker,
        mean_pose=np.zeros(spec.n_joints * 3, np.float32),
        mean_dir_vec=mean_vec, n_poses=34, subdivision_stride=10,
        fps=15, static_joints=(6, 9))
    assert len(samples) > 0
    batch = next(iter(BatchLoader(samples, batch_size=4, shuffle=False)))
    assert batch["target"].shape == (4, 34, spec.n_bones * 3)
    assert batch["audio"].shape[1] == int(round(34 / 15 * 16000))
    assert np.isfinite(np.asarray(batch["target"])).all()


def test_import_lmdb_limit(reference_format_lmdb, tmp_path):
    lmdb_dir, _ = reference_format_lmdb
    n = import_lmdb(str(lmdb_dir), str(tmp_path / "clips"), limit=3)
    assert n == 3


@pytest.fixture(scope="module")
def cache_format_lmdb(tmp_path_factory):
    """A preprocessed-cache lmdb in the reference's wire format
    (data_preprocessor.py:150-165 sample records)."""
    from ha2g_tpu.data.lmdb_mini import write_lmdb
    rng = np.random.default_rng(3)
    tmp = tmp_path_factory.mktemp("cache_lmdb")
    n_ext = 42  # n_poses * 1.25 extended windows, as the cache stores
    records = {}
    for i in range(12):
        words = [[f"w{rng.integers(0, 9)}", 1.0 + i + 0.2 * k,
                  1.1 + i + 0.2 * k] for k in range(4)]
        poses = rng.normal(size=(n_ext, 10, 3)).astype(np.float32)
        vec = rng.normal(size=(n_ext, 9, 3)).astype(np.float32) * 0.1
        audio = rng.normal(size=int(n_ext / 15 * 16000)) \
            .astype(np.float32) * 0.1
        spec = rng.normal(size=(128, 87)).astype(np.float16)
        aux = {"vid": f"vid_{i % 3}", "start_frame_no": i * 10,
               "end_frame_no": i * 10 + n_ext,
               "start_time": 1.0 + i, "end_time": 1.0 + i + n_ext / 15}
        rec = [words, poses, vec, audio, spec.astype(np.float32), aux]
        records[f"{i:010}".encode("ascii")] = pal.serialize(rec)
    write_lmdb(tmp / "lmdb_train_cache", records)
    return tmp / "lmdb_train_cache"


def test_import_cache_lmdb(cache_format_lmdb, tmp_path):
    from ha2g_tpu.data.lmdb_import import (import_cache_lmdb,
                                           load_imported_samples)
    from ha2g_tpu.data.loader import BatchLoader

    n = import_cache_lmdb(str(cache_format_lmdb), str(tmp_path / "out"))
    assert n == 12
    samples, lang, speaker = load_imported_samples(tmp_path / "out")
    assert len(samples) == 12
    assert samples.target.shape == (12, 34, 27)
    assert samples.audio.shape == (12, int(round(34 / 15 * 16000)))
    assert samples.spec.shape[1] == 128
    assert samples.text.shape == (12, 34)
    # frame-aligned tokens land inside the window and resolve via vocab
    assert samples.text.max() >= 4  # a real word index past the specials
    assert speaker.n_words >= 3
    batch = next(iter(BatchLoader(samples, 4, shuffle=False)))
    assert batch["target"].shape == (4, 34, 27)
    assert np.isfinite(np.asarray(batch["target"])).all()


def test_import_cache_lmdb_word_seq_semantics(cache_format_lmdb, tmp_path):
    from ha2g_tpu.data.lmdb_import import (import_cache_lmdb,
                                           load_imported_samples)
    import_cache_lmdb(str(cache_format_lmdb), str(tmp_path / "out"))
    samples, lang, _ = load_imported_samples(tmp_path / "out")
    from ha2g_tpu.data.vocab import EOS_TOKEN, SOS_TOKEN
    for i in range(len(samples)):
        seq = samples.word_seq[i][: samples.word_lengths[i]]
        assert seq[0] == SOS_TOKEN and seq[-1] == EOS_TOKEN
