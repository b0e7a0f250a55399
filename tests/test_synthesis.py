"""Sliding-window synthesis engine tests across model families (tiny dims)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ha2g_tpu.config import Config
from ha2g_tpu.data.vocab import Vocab
from ha2g_tpu.synthesis import (fade_out_to_mean, make_synthesizer,
                                polyfit_smooth, _window_layout)

N_WORDS, N_SPK = 16, 4
T = 34
AUDIO_LEN = int(round(T / 15 * 16000))


def _lang():
    lang = Vocab("words")
    for i in range(N_WORDS - lang.n_words):
        lang.index_word(f"w{i}")
    return lang


def _clip_inputs(B=2, seconds=5.0, seed=0):
    rng = np.random.default_rng(seed)
    audio = rng.normal(size=(B, int(seconds * 16000))).astype(np.float32) * .1
    words = [[(f"w{rng.integers(0, 10)}", float(t), float(t + 0.2))
              for t in np.arange(0.2, seconds - 0.3, 0.4)]
             for _ in range(B)]
    vids = rng.integers(0, N_SPK, (B,)).astype(np.int32)
    return audio, words, vids


def _batch(cfg, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (2, T))),
        "word_seq": jnp.asarray(rng.integers(1, N_WORDS, (2, 6))),
        "word_lengths": jnp.asarray([6, 4]),
        "spec": jnp.asarray(rng.normal(size=(2, 128, 70)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(2, AUDIO_LEN))
                             .astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(2, T, cfg.pose_dim))
                              .astype(np.float32) * 0.1),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (2,))),
    }


def _expected_frames(seconds, cfg):
    _, stride_time, num = _window_layout(cfg, seconds)
    return cfg.n_poses + (num - 1) * (cfg.n_poses - cfg.n_pre_poses)


def test_multimodal_synthesizer():
    from ha2g_tpu.train.baselines import MultimodalGanSystem
    cfg = Config(model="multimodal_context", pose_dim=27, n_poses=T,
                 hidden_size=16, n_layers=2, z_type="speaker")
    sys_ = MultimodalGanSystem(cfg, N_WORDS, N_SPK)
    state = sys_.init(jax.random.PRNGKey(0), _batch(cfg))
    synth = make_synthesizer(sys_, state)
    audio, words, vids = _clip_inputs()
    out = synth.generate(audio, words, _lang(), vids)
    assert out.shape == (2, _expected_frames(5.0, cfg), 27)
    assert np.isfinite(out).all()


def test_s2g_synthesizer():
    from ha2g_tpu.train.baselines import S2GSystem
    cfg = Config(model="speech2gesture", pose_dim=27, n_poses=T)
    sys_ = S2GSystem(cfg)
    state = sys_.init(jax.random.PRNGKey(0), _batch(cfg))
    synth = make_synthesizer(sys_, state)
    audio, words, vids = _clip_inputs()
    out = synth.generate(audio, words, _lang(), vids)
    assert out.shape == (2, _expected_frames(5.0, cfg), 27)


def test_seq2seq_synthesizer_with_smoothing():
    from ha2g_tpu.train.baselines import Seq2SeqSystem
    cfg = Config(model="seq2seq", pose_dim=27, n_poses=T, hidden_size=16,
                 n_layers=2)
    sys_ = Seq2SeqSystem(cfg, N_WORDS)
    state = sys_.init(jax.random.PRNGKey(0), _batch(cfg))
    synth = make_synthesizer(sys_, state)
    audio, words, vids = _clip_inputs()
    out = synth.generate(audio, words, _lang(), vids)
    assert out.shape == (2, _expected_frames(5.0, cfg), 27)
    assert np.isfinite(out).all()


def test_fade_out_ends_at_mean():
    cfg = Config(pose_dim=27, n_poses=T)
    x = np.ones((100, 27), np.float32)
    out = fade_out_to_mean(x, cfg, end_padding_duration_s=1.0)
    np.testing.assert_allclose(out[-1], 0.0, atol=1e-6)


def test_polyfit_smooth_preserves_shape():
    cfg = Config(pose_dim=27, n_poses=T, n_pre_poses=4)
    x = np.random.default_rng(0).normal(size=(94, 27)).astype(np.float32)
    out = polyfit_smooth(x, cfg)
    assert out.shape == x.shape
    assert np.isfinite(out).all()


def test_polyfit_smooth_matches_reference_math():
    """polyfit_smooth == a literal transcription of the reference's
    seq2seq spline-interp block (synthesize.py:163-185)."""
    cfg = Config(pose_dim=27, n_poses=T, n_pre_poses=4)
    rng = np.random.default_rng(7)
    num_subdivision = 4
    total = T + (num_subdivision - 1) * (T - 4)
    x_in = rng.normal(size=(total, 27)).astype(np.float32)

    want = x_in.copy()
    n_smooth = 4
    for i in range(num_subdivision):
        start_frame = 4 + i * (T - 4) - n_smooth
        if start_frame < 0:
            start_frame = 0
            end_frame = start_frame + n_smooth * 2
        else:
            end_frame = start_frame + n_smooth * 3
        y = want[start_frame:end_frame]
        x = np.array(range(0, y.shape[0]))
        coeffs = np.polyfit(x, y, 3)
        fit = [np.poly1d(coeffs[:, k]) for k in range(y.shape[1])]
        want[start_frame:end_frame] = np.transpose(
            np.asarray([fit[k](x) for k in range(y.shape[1])]))

    got = polyfit_smooth(x_in, cfg)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fade_out_matches_reference_math():
    """fade_out_to_mean == a literal transcription of the reference's
    fade-out block (synthesize.py:187-209)."""
    cfg = Config(pose_dim=27, n_poses=T, n_pre_poses=4)
    rng = np.random.default_rng(8)
    x_in = rng.normal(size=(94, 27)).astype(np.float32)
    end_padding_s = 0.8

    want = x_in.copy()
    n_smooth = 4
    start_frame = len(want) - int(end_padding_s * 15)
    end_frame = start_frame + n_smooth * 2
    if len(want) < end_frame:
        want = np.pad(want, [(0, end_frame - len(want)), (0, 0)],
                      mode="constant")
    want[end_frame - n_smooth:] = 0.0
    y = want[start_frame:end_frame]
    x = np.array(range(0, y.shape[0]))
    w = np.ones(len(y))
    w[0] = w[-1] = 5
    coeffs = np.polyfit(x, y, 2, w=w)
    fit = [np.poly1d(coeffs[:, k]) for k in range(y.shape[1])]
    want[start_frame:end_frame] = np.transpose(
        np.asarray([fit[k](x) for k in range(y.shape[1])]))

    got = fade_out_to_mean(x_in.copy(), cfg, end_padding_s)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_hierarchy_matches_host_loop():
    """The fused lax.scan synthesis path must equal the host window loop."""
    from ha2g_tpu.train.hierarchy import HierarchySystem
    from ha2g_tpu.synthesis import HierarchySynthesizer
    cfg = Config(model="hierarchy", dataset="ted_gesture", pose_dim=27,
                 n_poses=T, n_pre_poses=4, hidden_size=32, n_layers=2,
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
    synth = HierarchySynthesizer(sys_, state)
    audio, words, vids = _clip_inputs(seconds=5.0)
    key = jax.random.PRNGKey(7)
    host = synth.generate(audio, words, _lang(), vids, rng=key)
    fused = synth.generate_fused(audio, words, _lang(), vids, rng=key)
    assert host.shape == fused.shape
    np.testing.assert_allclose(fused, host, atol=2e-5)


def test_fused_chunked_matches_unchunked():
    """Pipelined chunked dispatch (run_fused(chunk=N)) is pure scheduling:
    per-clip independence means results are element-equal to one shot."""
    from ha2g_tpu.train.hierarchy import HierarchySystem
    from ha2g_tpu.synthesis import HierarchySynthesizer
    cfg = Config(model="hierarchy", dataset="ted_gesture", pose_dim=27,
                 n_poses=T, n_pre_poses=4, hidden_size=32, n_layers=2,
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
    # pin speaker z at mu: the reparameterization eps draw's shape is the
    # batch size, so ANY batch-size change (chunking included) changes the
    # draw — the same behavior as the reference's torch.randn_like.  With
    # z == mu the fused pipeline is purely per-clip and chunk-invariant.
    params = jax.device_get(state.params)
    for g in params["gens"]:
        lv = g["SpeakerZ_0"]["Dense_2"]["Dense_0"]
        lv["kernel"] = np.zeros_like(lv["kernel"])
        lv["bias"] = np.full_like(lv["bias"], -100.0)
    state = state.replace(params=params)
    synth = HierarchySynthesizer(sys_, state)
    audio, words, vids = _clip_inputs(B=4, seconds=5.0)
    plan = synth.prepare_fused(words, _lang(), vids, audio.shape[1],
                               rng=jax.random.PRNGKey(7))
    one = synth.run_fused(audio, plan)
    chunked = synth.run_fused(audio, plan, chunk=2)
    np.testing.assert_array_equal(one, chunked)

    # f16 pull: the compact device->host format returns float32 within
    # half-precision rounding of the full pull (both chunked and not)
    f16 = synth.run_fused(audio, plan, out_dtype=np.float16)
    f16c = synth.run_fused(audio, plan, chunk=2, out_dtype=np.float16)
    assert f16.dtype == np.float32 and f16c.dtype == np.float32
    scale = np.abs(one).max()
    np.testing.assert_allclose(f16, one, atol=2e-3 * scale)
    np.testing.assert_array_equal(f16, f16c)


def test_mulaw_audio_input():
    """uint8 mu-law input: codec round trip is transparent enough that the
    log-mel features (and thus synthesis) stay close to the float path."""
    from ha2g_tpu.ops.mel import (batched_log_mel, batched_log_mel_mulaw,
                                  mulaw_encode_np, mulaw_decode)
    rng = np.random.default_rng(3)
    t = np.arange(16000 * 2) / 16000.0
    wave = (0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 733 * t)
            + 0.02 * rng.normal(size=t.shape)).astype(np.float32)[None]
    u8 = mulaw_encode_np(wave)
    assert u8.dtype == np.uint8

    # decode SNR: G.711-grade companding is ~35+ dB on speech-level signals
    dec = np.asarray(mulaw_decode(jnp.asarray(u8)))
    snr = 10 * np.log10(np.mean(wave ** 2) / np.mean((dec - wave) ** 2))
    assert snr > 30, snr

    m_f = np.asarray(batched_log_mel(jnp.asarray(wave)))
    m_u = np.asarray(batched_log_mel_mulaw(jnp.asarray(u8)))
    assert m_u.shape == m_f.shape
    # log-mel dB features: close over the energetic region
    mask = m_f > (m_f.max() - 40.0)
    assert np.abs(m_u - m_f)[mask].mean() < 1.0
    assert np.abs(m_u - m_f)[mask].max() < 6.0
