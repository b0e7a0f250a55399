"""Mel-spectrogram front-end as MXU matmuls.

Replaces librosa's C/FFT-backed DSP used by the reference:
`librosa.feature.melspectrogram(y, sr=16000, n_fft=1024, hop_length=512,
power=2)` + `librosa.power_to_db(ref=np.max)` (scripts/utils/data_utils.py:34-38).

TPU-first formulation: with hop = n_fft/2 the frame matrix is built from two
shifted reshape views (zero gather cost), and the STFT is a matmul of the
frame matrix against a precomputed window*DFT basis — (F, 1024) @ (1024, 513)
lands on the MXU, followed by the (513 -> 128) mel projection matmul.  XLA
fuses the squaring/add between the two.

Semantics matched to librosa 0.8-era defaults (hann periodic window,
center=True with reflect padding, slaney-normalized mel filterbank, htk=False,
power_to_db amin=1e-10 top_db=80).  NOTE: `ref=np.max` makes the dB scaling
depend on the per-signal global max, so the op is inherently two-pass over the
mel energies; we fuse the max-reduce into the same jit.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

SR = 16000
N_FFT = 1024
HOP = 512
N_MELS = 128


# ---------------------------------------------------------------------------
# Filterbank / basis construction (host-side, cached)
# ---------------------------------------------------------------------------

def _hz_to_mel(f):
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = f_sp * m
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@lru_cache(maxsize=None)
def mel_filterbank(sr: int = SR, n_fft: int = N_FFT, n_mels: int = N_MELS,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(1 + n_fft//2, n_mels) slaney-normalized triangular filterbank,
    numerically identical to librosa.filters.mel(htk=False, norm='slaney')."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_bins, n_mels)


@lru_cache(maxsize=None)
def dft_basis(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT bases: (n_fft, 1 + n_fft//2) cos and -sin, with
    a periodic hann window baked in so STFT = frames @ basis."""
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)  # hann, periodic
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


# ---------------------------------------------------------------------------
# JAX ops
# ---------------------------------------------------------------------------

def _frame_signal(y: jnp.ndarray, n_fft: int, hop: int,
                  center: bool = True) -> jnp.ndarray:
    """(..., n_samples) -> (..., n_frames, n_fft) with center reflect padding
    (center=False frames the raw signal — the streaming front-end slices
    hop-aligned segments with real context and must not re-pad them).

    For hop == n_fft//2 (the HA2G configuration) frames are two adjacent
    hop-chunks, so framing is two reshapes + concat (no gather).
    """
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        yp = jnp.pad(y, pad, mode="reflect")
    else:
        yp = y
    n = yp.shape[-1]
    if hop * 2 == n_fft:
        n_chunks = n // hop
        usable = n_chunks * hop
        chunks = yp[..., :usable].reshape(yp.shape[:-1] + (n_chunks, hop))
        frames = jnp.concatenate([chunks[..., :-1, :], chunks[..., 1:, :]], axis=-1)
        return frames
    n_frames = 1 + (n - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return yp[..., idx]


def power_spectrogram(y: jnp.ndarray, n_fft: int = N_FFT,
                      hop: int = HOP, center: bool = True) -> jnp.ndarray:
    """|STFT|^2: (..., n_samples) -> (..., n_frames, 1 + n_fft//2)."""
    cos_b, sin_b = dft_basis(n_fft)
    frames = _frame_signal(y, n_fft, hop, center)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    return re * re + im * im


def power_to_db(s: jnp.ndarray, amin: float = 1e-10,
                top_db: float = 80.0) -> jnp.ndarray:
    """librosa.power_to_db(ref=np.max): per-array global-max referenced dB,
    floored at (max - top_db).  Reduces over ALL axes (librosa semantics; the
    reference always calls this on one clip at a time)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(s, amin))
    ref = jnp.max(log_spec)
    log_spec = log_spec - ref
    return jnp.maximum(log_spec, -top_db)


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels"))
def log_mel_spectrogram(y: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP,
                        n_mels: int = N_MELS) -> jnp.ndarray:
    """End-to-end fused mel front-end for ONE clip.

    y: (n_samples,) -> (n_mels, n_frames) float32 log-mel in dB, matching
    reference extract_melspectrogram (data_utils.py:34-38) up to its fp16
    round-off (the reference stores fp16 and upcasts at batch time).
    """
    spec = power_spectrogram(y, n_fft, hop)          # (F, bins)
    mel = spec @ jnp.asarray(mel_filterbank(SR, n_fft, n_mels))  # (F, n_mels)
    return power_to_db(mel).T                         # (n_mels, F)


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels", "center"))
def log_mel_abs(y: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP,
                n_mels: int = N_MELS, center: bool = True) -> jnp.ndarray:
    """UN-referenced log-mel: ``10*log10(max(mel, amin))`` — i.e.
    log_mel_spectrogram before the per-clip ``ref=np.max`` subtraction and
    the -80 dB floor.  The streaming synthesis front-end consumes this and
    applies its own RUNNING reference (librosa's ref is the whole clip's
    peak, unknowable live).  center=False frames the signal raw so
    hop-aligned mid-stream segments produce exactly the frames the
    full-clip centered transform would (each interior frame sees only real
    samples).  (n_samples,) -> (n_mels, n_frames)."""
    spec = power_spectrogram(y, n_fft, hop, center)
    mel = spec @ jnp.asarray(mel_filterbank(SR, n_fft, n_mels))
    return (10.0 * jnp.log10(jnp.maximum(mel, 1e-10))).T


# NOTE jit-of-vmap, not bare vmap: vmap over the inner jit dispatches the
# DFT/mel ops one by one (each a ~34 ms host->device round trip on this
# TPU's tunnel — measured 10.6 s for a 256x20s batch vs 0.25 s fused)
batched_log_mel = jax.jit(jax.vmap(log_mel_spectrogram))
batched_log_mel.__doc__ = \
    "(B, n_samples) -> (B, n_mels, n_frames); per-clip dB referencing."


@jax.jit
def batched_log_mel_i16(pcm: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM variant: wav files carry 16-bit samples natively, and the
    host->device audio upload dominates batch synthesis on this TPU's
    tunnel — shipping PCM halves it.  Dequantizes on device with the
    soundfile/librosa convention (x / 32768)."""
    return jax.vmap(log_mel_spectrogram)(
        pcm.astype(jnp.float32) / 32768.0)


# G.711 mu-law: 8-bit companded PCM (telephony's native format).  Decode
# runs on device (a handful of elementwise ops), so bandwidth-constrained
# callers ship ONE byte per sample — a quarter of float32, half of int16.
_MULAW_MU = 255.0


def mulaw_encode_np(x: np.ndarray) -> np.ndarray:
    """float waveform in [-1, 1] -> uint8 mu-law bytes (host-side helper
    for clients/tests; G.711's continuous-mu approximation)."""
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MULAW_MU * np.abs(x)) / np.log1p(_MULAW_MU)
    return ((y + 1.0) / 2.0 * _MULAW_MU + 0.5).astype(np.uint8)


def mulaw_decode(u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 mu-law bytes -> float32 waveform in [-1, 1] (device-side)."""
    y = u8.astype(jnp.float32) * (2.0 / _MULAW_MU) - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + _MULAW_MU, jnp.abs(y)) - 1.0) \
        / _MULAW_MU


def mulaw_decode_np(u8: np.ndarray) -> np.ndarray:
    """Host-side twin of mulaw_decode (same formula; the ONE place the
    companding convention lives for host decoders — synthesis host paths
    and the HTTP front-end both call this)."""
    y = np.asarray(u8, np.uint8).astype(np.float32) * (2.0 / _MULAW_MU) - 1.0
    return np.sign(y) * (np.power(1.0 + _MULAW_MU, np.abs(y)) - 1.0) \
        / _MULAW_MU


def pcm_to_float_np(samples: np.ndarray) -> np.ndarray:
    """Host-side decode of any supported wire sample format to float32:
    int16 PCM (/32768, the soundfile convention), uint8 G.711 mu-law, or
    float passthrough."""
    samples = np.asarray(samples)
    if samples.dtype == np.int16:
        return samples.astype(np.float32) / 32768.0
    if samples.dtype == np.uint8:
        return mulaw_decode_np(samples)
    return samples.astype(np.float32)


@jax.jit
def batched_log_mel_mulaw(u8: jnp.ndarray) -> jnp.ndarray:
    """mu-law uint8 PCM variant: one byte per sample over the host->device
    link, decoded to float on device before the mel front-end."""
    return jax.vmap(log_mel_spectrogram)(mulaw_decode(u8))


# ---------------------------------------------------------------------------
# NumPy reference (independent math path, for unit tests only)
# ---------------------------------------------------------------------------

def log_mel_np(y: np.ndarray, n_fft: int = N_FFT, hop: int = HOP,
               n_mels: int = N_MELS) -> np.ndarray:
    """Reimplementation of librosa.feature.melspectrogram + power_to_db via
    np.fft.rfft — independent of the matmul-DFT path above."""
    yp = np.pad(y.astype(np.float64), (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.stack([yp[i * hop: i * hop + n_fft] * window
                       for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = spec @ mel_filterbank(SR, n_fft, n_mels).astype(np.float64)
    log_spec = 10.0 * np.log10(np.maximum(mel, 1e-10))
    log_spec -= log_spec.max()
    return np.maximum(log_spec, -80.0).T
