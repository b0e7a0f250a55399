"""Data pipeline tests: synthetic clips -> windowing -> fixed-shape batches,
sharded over the fake 8-device mesh."""

import numpy as np
import jax
import pytest

from ha2g_tpu.data import (BatchLoader, Vocab, build_vocab,
                           default_mean_dir_vec, synthetic_clips,
                           window_clips)
from ha2g_tpu.parallel import batch_sharding, data_mesh
from ha2g_tpu.skeleton import TED_EXPRESSIVE, TED_GESTURE


@pytest.fixture(scope="module")
def gesture_samples():
    spec = TED_GESTURE
    clips = synthetic_clips(spec, n_clips=6, clip_seconds=8.0, n_speakers=3)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    mean_vec = default_mean_dir_vec(spec)
    mean_pose = np.zeros((spec.n_joints * 3,), np.float32)
    samples = window_clips(clips, spec, lang, speaker, mean_pose, mean_vec)
    return spec, lang, speaker, samples


def test_window_shapes(gesture_samples):
    spec, lang, speaker, s = gesture_samples
    n = len(s)
    assert n > 10
    assert s.text.shape == (n, 34)
    assert s.target.shape == (n, 34, 27)
    assert s.pose.shape == (n, 34, 30)
    assert s.audio.shape == (n, 36267)
    assert s.spec.shape == (n, 128, 70)
    assert s.vids.max() < speaker.n_words
    # targets are unit dir vecs minus mean: adding the mean back must give
    # unit vectors
    mean_vec = default_mean_dir_vec(spec)
    raw = s.target[0] + mean_vec[None, :]
    norms = np.linalg.norm(raw.reshape(34, 9, 3), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_expressive_windowing():
    spec = TED_EXPRESSIVE
    clips = synthetic_clips(spec, n_clips=2, clip_seconds=6.0)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    samples = window_clips(clips, spec, lang, speaker,
                           np.zeros(spec.n_joints * 3, np.float32),
                           default_mean_dir_vec(spec), static_joints=(6, 7))
    assert samples.target.shape[2] == 126


def test_batch_loader_sharded(gesture_samples):
    spec, lang, speaker, s = gesture_samples
    mesh = data_mesh()
    assert mesh.devices.size == 8
    loader = BatchLoader(s, batch_size=16, sharding=batch_sharding(mesh))
    batch = next(iter(loader))
    assert batch["target"].shape == (16, 34, 27)
    assert batch["target"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_vocab_roundtrip(tmp_path, gesture_samples):
    _, lang, _, _ = gesture_samples
    p = tmp_path / "vocab.json"
    lang.save(p)
    lang2 = Vocab.load(p)
    assert lang2.n_words == lang.n_words
    assert lang2.get_word_index("the") == lang.get_word_index("the")
    assert lang2.get_word_index("zzz_unknown") == Vocab.UNK_token
    # counts survive the round trip (Vocab.trimmed depends on them)
    assert lang2.word2count == lang.word2count


def test_merge_clips(tmp_path):
    from ha2g_tpu.data.storage import load_clips, merge_clips, save_clips
    a = synthetic_clips(TED_GESTURE, n_clips=2, clip_seconds=4.0, seed=1)
    b = synthetic_clips(TED_GESTURE, n_clips=3, clip_seconds=4.0, seed=2)
    save_clips(tmp_path / "a", a)
    save_clips(tmp_path / "b", b)
    n = merge_clips([tmp_path / "a", tmp_path / "b"], tmp_path / "merged")
    assert n == 5
    merged = load_clips(tmp_path / "merged")
    assert len(merged) == 5
    np.testing.assert_allclose(merged[0]["skeletons_3d"], a[0]["skeletons_3d"])
    np.testing.assert_allclose(merged[2]["skeletons_3d"], b[0]["skeletons_3d"])


def test_loader_prefetch_yields_identical_batches():
    from ha2g_tpu.data.loader import BatchLoader
    from ha2g_tpu.data.synthetic import synthetic_clips, default_mean_dir_vec
    from ha2g_tpu.data.dataset import window_clips
    from ha2g_tpu.data.vocab import Vocab, build_vocab
    from ha2g_tpu.skeleton import TED_GESTURE
    import numpy as np

    clips = synthetic_clips(TED_GESTURE, n_clips=4, clip_seconds=6.0, seed=5)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    samples = window_clips(
        clips, spec=TED_GESTURE, lang=lang, speaker=speaker,
        mean_pose=np.zeros(TED_GESTURE.n_joints * 3, np.float32),
        mean_dir_vec=default_mean_dir_vec(TED_GESTURE), n_poses=34,
        subdivision_stride=10, fps=15, static_joints=(6, 9))

    a = list(BatchLoader(samples, 4, shuffle=True, seed=3, prefetch=0))
    b = list(BatchLoader(samples, 4, shuffle=True, seed=3, prefetch=2))
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(np.asarray(x[k]), np.asarray(y[k]))

    # abandoning iteration early must not deadlock or leak the worker
    import threading
    before = threading.active_count()
    for _ in range(8):
        loader = BatchLoader(samples, 4, prefetch=2)
        _ = next(iter(loader))
    import time
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_loader_prefetch_full_queue_at_epoch_end():
    """Regression: the end-of-epoch sentinel must be delivered even when
    the prefetch queue is full when the producer finishes (a dropped
    sentinel hangs the consumer forever)."""
    import time
    from ha2g_tpu.data.loader import BatchLoader
    from ha2g_tpu.data.synthetic import synthetic_clips, default_mean_dir_vec
    from ha2g_tpu.data.dataset import window_clips
    from ha2g_tpu.data.vocab import Vocab, build_vocab
    from ha2g_tpu.skeleton import TED_GESTURE
    import numpy as np

    clips = synthetic_clips(TED_GESTURE, n_clips=4, clip_seconds=6.0, seed=6)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    samples = window_clips(
        clips, spec=TED_GESTURE, lang=lang, speaker=speaker,
        mean_pose=np.zeros(TED_GESTURE.n_joints * 3, np.float32),
        mean_dir_vec=default_mean_dir_vec(TED_GESTURE), n_poses=34,
        subdivision_stride=10, fps=15, static_joints=(6, 9))
    loader = BatchLoader(samples, 4, prefetch=2)
    # slow consumer: let the producer finish and fill the queue first
    got = 0
    it = iter(loader)
    time.sleep(1.0)
    for _ in it:
        got += 1
        time.sleep(0.05)
    assert got == len(loader)


def test_loader_prefetch_propagates_worker_errors():
    """A failing producer must raise in the consumer, not end the epoch
    silently (code-review round 2 finding)."""
    from ha2g_tpu.data.loader import BatchLoader
    from ha2g_tpu.data.synthetic import synthetic_clips, default_mean_dir_vec
    from ha2g_tpu.data.dataset import window_clips
    from ha2g_tpu.data.vocab import Vocab, build_vocab
    from ha2g_tpu.skeleton import TED_GESTURE
    import numpy as np
    import pytest

    clips = synthetic_clips(TED_GESTURE, n_clips=2, clip_seconds=6.0, seed=7)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    samples = window_clips(
        clips, spec=TED_GESTURE, lang=lang, speaker=speaker,
        mean_pose=np.zeros(TED_GESTURE.n_joints * 3, np.float32),
        mean_dir_vec=default_mean_dir_vec(TED_GESTURE), n_poses=34,
        subdivision_stride=10, fps=15, static_joints=(6, 9))
    loader = BatchLoader(samples, 4, prefetch=2,
                         keys=("target", "no_such_field"))
    with pytest.raises(AttributeError):
        list(loader)
