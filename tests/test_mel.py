"""Mel front-end parity: matmul-DFT JAX path vs independent numpy rfft path
(both implementing librosa 0.8 melspectrogram + power_to_db(ref=max)
semantics, reference data_utils.py:34-43)."""

import numpy as np
import jax.numpy as jnp

from ha2g_tpu.ops import mel


def test_mel_filterbank_shape_and_norm():
    fb = mel.mel_filterbank()
    assert fb.shape == (513, 128)
    # each filter has positive weight and triangles cover the band
    assert (fb.sum(axis=0) > 0).all()


def test_log_mel_matches_numpy_reference():
    rng = np.random.default_rng(0)
    y = rng.normal(size=16000).astype(np.float32) * 0.1
    got = np.asarray(mel.log_mel_spectrogram(jnp.asarray(y)))
    want = mel.log_mel_np(y)
    assert got.shape == want.shape == (128, 1 + 16000 // 512)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_spectrogram_length_formula():
    """Reference calc_spectrogram_length_from_motion_length
    (data_utils.py:41-43): 34 frames @15fps -> 70 columns after window
    cropping; center=True STFT yields 71, the loader crops to 70."""
    n_samples = int(round(34 / 15 * 16000))
    y = np.zeros(n_samples, dtype=np.float32)
    s = np.asarray(mel.log_mel_spectrogram(jnp.asarray(y)))
    expected = int(round((34 / 15 * 16000 - 1024) / 512 + 1))
    assert expected == 70
    assert s.shape[1] >= expected


def test_power_to_db_max_ref_and_floor():
    s = jnp.asarray([1e-20, 1.0, 100.0])
    db = np.asarray(mel.power_to_db(s))
    assert db.max() == 0.0          # ref = max
    assert db.min() == -80.0        # top_db floor
    np.testing.assert_allclose(db[1], -20.0, atol=1e-5)


def test_batched_matches_per_clip():
    rng = np.random.default_rng(1)
    y = rng.normal(size=(3, 8192)).astype(np.float32)
    batched = np.asarray(mel.batched_log_mel(jnp.asarray(y)))
    for i in range(3):
        single = np.asarray(mel.log_mel_spectrogram(jnp.asarray(y[i])))
        np.testing.assert_allclose(batched[i], single, atol=5e-4)


def test_batched_log_mel_i16_matches_float_path():
    """int16 PCM fast path: dequantize-on-device must equal the float
    pipeline fed the same dequantized signal."""
    import numpy as np
    import jax.numpy as jnp
    from ha2g_tpu.ops.mel import batched_log_mel, batched_log_mel_i16

    rng = np.random.default_rng(0)
    pcm = (rng.normal(size=(3, 16000)) * 3000).clip(-32768, 32767) \
        .astype(np.int16)
    a = np.asarray(batched_log_mel_i16(jnp.asarray(pcm)))
    b = np.asarray(batched_log_mel(
        jnp.asarray(pcm.astype(np.float32) / 32768.0)))
    np.testing.assert_allclose(a, b, atol=1e-4)
