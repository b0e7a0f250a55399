"""GestureStream: incremental (live) synthesis vs the batch window loop.

The streaming engine must reproduce the batch path exactly when its two
documented divergences are controlled: the window layout (pass
total_seconds) and the running dB reference (put the clip's loudest mel
frame in the first window).  See synthesis.py::GestureStream.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ha2g_tpu.config import Config
from ha2g_tpu.data.vocab import Vocab
from ha2g_tpu.synthesis import HierarchySynthesizer, _window_layout

N_WORDS, N_SPK = 16, 4
T = 34


def _lang():
    lang = Vocab("words")
    for i in range(N_WORDS - lang.n_words):
        lang.index_word(f"w{i}")
    return lang


@pytest.fixture(scope="module")
def hier_synth():
    from ha2g_tpu.train.hierarchy import HierarchySystem
    cfg = Config(model="hierarchy", dataset="ted_gesture", pose_dim=27,
                 n_poses=T, n_pre_poses=4, hidden_size=16, n_layers=2,
                 z_type="speaker")
    sys_ = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (2, T))),
        "spec": jnp.asarray(rng.normal(size=(2, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(2, T, 27)).astype(np.float32)),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (2,))),
    }
    state = sys_.init(jax.random.PRNGKey(0), batch)
    return HierarchySynthesizer(sys_, state)


def _clip(seconds=6.0, seed=3):
    """Audio whose loudest mel frame is inside the FIRST window (a strong
    click at 0.5 s), so the stream's running dB reference equals the batch
    path's whole-clip reference from window 0 on."""
    rng = np.random.default_rng(seed)
    audio = rng.normal(size=int(seconds * 16000)).astype(np.float32) * 0.05
    i0 = 8000
    audio[i0:i0 + 640] += np.sin(np.arange(640) * 0.7).astype(np.float32)
    words = [(f"w{rng.integers(0, 10)}", float(t), float(t + 0.2))
             for t in np.arange(0.2, seconds - 0.3, 0.4)]
    return audio, words


def test_stream_matches_batch_known_total(hier_synth):
    """Known duration + early peak -> streaming output == generate()."""
    audio, words = _clip(6.0)
    lang = _lang()
    rng = jax.random.PRNGKey(7)
    want = hier_synth.generate(audio[None], [words], lang,
                               np.asarray([2], np.int32), rng=rng)[0]

    stream = hier_synth.stream(lang, vid=2, total_seconds=6.0, rng=rng)
    # irregular chunk sizes crossing window boundaries; words fed with the
    # audio that covers them
    chunks = [0.3, 1.9, 0.05, 2.2, 1.0, 0.55]
    got, t0 = [], 0.0
    pos = 0
    for c in chunks:
        n = int(c * 16000)
        w = [x for x in words if t0 <= x[1] < t0 + c]
        got.append(stream.feed(audio[pos:pos + n], words=w))
        pos += n
        t0 += c
    assert pos == len(audio)
    got.append(stream.finish())
    got = np.concatenate(got, axis=0)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_stream_random_chunking_fuzz(hier_synth):
    """Property: ANY chunk partition of the audio (including 1-sample and
    multi-window chunks, words delivered with their audio) produces the
    same output as the batch path."""
    lang = _lang()
    for seed in (13, 17, 29):
        rng = np.random.default_rng(seed)
        seconds = float(rng.uniform(3.0, 7.0))
        audio, words = _clip(seconds, seed=seed)
        key = jax.random.PRNGKey(seed)
        want = hier_synth.generate(audio[None], [words], lang,
                                   np.asarray([seed % N_SPK], np.int32),
                                   rng=key)[0]
        stream = hier_synth.stream(lang, vid=seed % N_SPK,
                                   total_seconds=seconds, rng=key)
        # transcript known up front (the TTS case); audio cut anywhere —
        # a window is runnable one spec frame (~32 ms) before its nominal
        # end, so words must lead the audio by at least that much (see
        # GestureStream docstring); delivering them all first is the
        # simplest conforming schedule
        stream.feed(words=words)
        cuts = np.sort(rng.integers(1, len(audio), rng.integers(2, 9)))
        got, prev = [], 0
        for c in list(cuts) + [len(audio)]:
            got.append(stream.feed(audio[prev:c]))
            prev = c
        got.append(stream.finish())
        got = np.concatenate(got, axis=0)
        assert got.shape == want.shape, seed
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0,
                                   err_msg=f"seed {seed}")


def test_stream_incremental_latency(hier_synth):
    """Frames become available while audio arrives: after feeding enough
    audio for window 0 (but far less than the clip), the stream has already
    emitted window 0's frames."""
    audio, words = _clip(8.0)
    lang = _lang()
    stream = hier_synth.stream(lang, vid=1, total_seconds=8.0)
    spec_need = (stream._s0(0) + stream.spec_len) * 512  # window-0 samples
    out1 = stream.feed(audio[:spec_need], words=words)
    assert out1.shape == (T - 4, 27)        # first window minus held tail
    out2 = stream.feed(audio[spec_need:])
    rest = stream.finish()
    total = np.concatenate([out1, out2, rest], axis=0)
    _, _, num = _window_layout(hier_synth.cfg, 8.0)
    assert total.shape == (T + (num - 1) * (T - 4), 27)
    assert np.isfinite(total).all()


def test_stream_unknown_total(hier_synth):
    """Live mode (no total_seconds): sample-exact layout, same frame count
    as the batch path, finite output."""
    audio, words = _clip(5.0, seed=9)
    lang = _lang()
    stream = hier_synth.stream(lang, vid=0)
    out = [stream.feed(audio[:40000], words=words),
           stream.feed(audio[40000:])]
    out.append(stream.finish())
    out = np.concatenate(out, axis=0)
    _, _, num = _window_layout(hier_synth.cfg, 5.0)
    assert out.shape == (T + (num - 1) * (T - 4), 27)
    assert np.isfinite(out).all()


def test_stream_short_clip_single_window(hier_synth):
    """A clip shorter than one window runs as a single edge-padded window
    at finish(), like the batch path."""
    audio, words = _clip(1.5, seed=5)
    lang = _lang()
    want = hier_synth.generate(audio[None], [words], lang,
                               np.asarray([1], np.int32))[0]
    stream = hier_synth.stream(lang, vid=1, total_seconds=1.5)
    a = stream.feed(audio, words=words)
    b = stream.finish()
    got = np.concatenate([a, b], axis=0)
    assert got.shape == want.shape == (T, 27)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_stream_speech2gesture_matches_batch():
    """GestureStream drives any spec-windowed synthesizer: the
    speech2gesture U-Net path matches its batch loop too."""
    from ha2g_tpu.train.baselines import S2GSystem
    from ha2g_tpu.synthesis import make_synthesizer
    cfg = Config(model="speech2gesture", pose_dim=27, n_poses=T)
    sys_ = S2GSystem(cfg)
    rng = np.random.default_rng(2)
    batch = {
        "spec": jnp.asarray(rng.normal(size=(2, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(2, T, 27)).astype(np.float32) * 0.1),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (2,))),
    }
    state = sys_.init(jax.random.PRNGKey(0), batch)
    synth = make_synthesizer(sys_, state)
    audio, words = _clip(5.0, seed=15)
    lang = _lang()
    want = synth.generate(audio[None], [words], lang,
                          np.asarray([0], np.int32))[0]
    st = synth.stream(lang, vid=0, total_seconds=5.0)
    got = np.concatenate([st.feed(audio, words=words), st.finish()], axis=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_stream_expressive_matches_batch():
    """Same equivalence on the TED Expressive 6-level flagship skeleton
    (126-dim poses) — the stream is SkeletonSpec-parameterized."""
    from ha2g_tpu.train.hierarchy import HierarchySystem
    cfg = Config(model="hierarchy", dataset="ted_expressive", pose_dim=126,
                 n_poses=T, n_pre_poses=4, hidden_size=16, n_layers=2,
                 z_type="speaker")
    sys_ = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    rng = np.random.default_rng(1)
    batch = {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (2, T))),
        "spec": jnp.asarray(rng.normal(size=(2, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(2, T, 126)).astype(np.float32) * 0.1),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (2,))),
    }
    state = sys_.init(jax.random.PRNGKey(0), batch)
    synth = HierarchySynthesizer(sys_, state)
    audio, words = _clip(4.0, seed=21)
    lang = _lang()
    key = jax.random.PRNGKey(3)
    want = synth.generate(audio[None], [words], lang,
                          np.asarray([1], np.int32), rng=key)[0]
    st = synth.stream(lang, vid=1, total_seconds=4.0, rng=key)
    got = np.concatenate([st.feed(audio[:30000], words=words),
                          st.feed(audio[30000:]), st.finish()], axis=0)
    assert got.shape == want.shape and got.shape[1] == 126
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_mel_any_no_device_to_host_transfer():
    """Regression (code-review finding): _mel_any must not pull an
    already-on-device audio batch back to host to probe its dtype — the
    mesh path hands it sharded arrays whose round trip would cost seconds
    on the tunnel."""
    from ha2g_tpu.synthesis import _mel_any
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16000)).astype(np.float32))
    jax.block_until_ready(audio)
    with jax.transfer_guard_device_to_host("disallow"):
        spec = _mel_any(audio)
    assert spec.shape[0] == 2


def test_fused_synthesis_sharded_matches_single(hier_synth):
    """Multi-chip batch synthesis: run_fused with the clip batch sharded
    over the virtual 8-device data mesh reproduces the single-device
    output (partitionable threefry keeps the z draws equal)."""
    from ha2g_tpu.parallel.mesh import data_mesh

    rng = np.random.default_rng(31)
    B = 8
    audio = rng.normal(size=(B, 4 * 16000)).astype(np.float32) * 0.1
    words = [[(f"w{rng.integers(0, 10)}", float(t), float(t + 0.2))
              for t in np.arange(0.2, 3.5, 0.4)] for _ in range(B)]
    vids = rng.integers(0, N_SPK, (B,)).astype(np.int32)
    lang = _lang()

    plan = hier_synth.prepare_fused(words, lang, vids, audio.shape[1])
    want = hier_synth.run_fused(audio, plan)
    got = hier_synth.run_fused(audio, plan, mesh=data_mesh(8))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_stream_compact_pcm_inputs(hier_synth):
    """int16 and mu-law chunks decode to the same stream as float32."""
    audio, words = _clip(3.0, seed=11)
    lang = _lang()

    def run(chunks):
        s = hier_synth.stream(lang, vid=3, total_seconds=3.0)
        outs = [s.feed(c, words=words if i == 0 else ())
                for i, c in enumerate(chunks)]
        outs.append(s.finish())
        return np.concatenate(outs, axis=0)

    ref = run([audio])
    i16 = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    got_i16 = run([i16])
    # int16 quantization noise is ~3e-5 on the waveform; the cascade keeps
    # it small
    np.testing.assert_allclose(got_i16, ref, atol=2e-2, rtol=0)

    from ha2g_tpu.ops.mel import mulaw_encode_np
    got_u8 = run([mulaw_encode_np(audio)])
    assert got_u8.shape == ref.shape
    assert np.isfinite(got_u8).all()
