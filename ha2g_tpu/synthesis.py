"""Sliding-window gesture synthesis engine.

Rebuild of the reference generators (synthesize_hierarchy.py:36-215,
synthesize.py:36-209): long audio is processed in n_poses-frame windows with
stride n_poses - n_pre_poses; each window is seeded with the last n_pre
predicted frames of the previous window, and overlapping frames are linearly
cross-faded on the host.

TPU-first design:
* The per-window step (audio encoder + full level cascade) is ONE jitted
  function; windows within a clip are sequentially dependent (the pre-seq
  carry), but the engine synthesizes a BATCH of independent clips
  simultaneously — the throughput axis the per-clip reference loop never
  exploits.
* The mel front-end runs once per clip on-device (ops/mel.py) instead of
  librosa on host.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ha2g_tpu.config import Config
from ha2g_tpu.data.dataset import spectrogram_length_for
from ha2g_tpu.data.vocab import Vocab
from ha2g_tpu.ops.mel import log_mel_spectrogram
from ha2g_tpu.skeleton import SkeletonSpec
from ha2g_tpu.train.cascade import run_cascade

SR = 16000


def _window_layout(cfg: Config, clip_seconds: float):
    unit_time = cfg.n_poses / cfg.motion_resampling_framerate
    stride_time = (cfg.n_poses - cfg.n_pre_poses) / \
        cfg.motion_resampling_framerate
    if clip_seconds < unit_time:
        num = 1
    else:
        num = math.ceil((clip_seconds - unit_time) / stride_time) + 1
    return unit_time, stride_time, num


def frame_aligned_word_indices(words, start_time, end_time, n_frames,
                               lang: Vocab) -> np.ndarray:
    """synthesize_hierarchy.py:100-113."""
    ext = np.zeros(n_frames, dtype=np.int32)
    frame_duration = (end_time - start_time) / n_frames
    for w in words:
        if w[1] < start_time or w[1] > end_time:
            continue
        idx = max(0, int(np.floor((w[1] - start_time) / frame_duration)))
        if idx < n_frames:
            ext[idx] = lang.get_word_index(w[0])
    return ext


class HierarchySynthesizer:
    """Batched sliding-window synthesis for the hierarchy model."""

    def __init__(self, system, state, fixed_batch: Optional[int] = None):
        self.system = system
        self.cfg = system.cfg
        self.spec: SkeletonSpec = system.spec
        self.params = state.params
        self.batch_stats = state.batch_stats
        self._window_step = jax.jit(self._window_step_fn)

    def _window_step_fn(self, params, batch_stats, in_spec, in_text, carry,
                        vids, rng):
        """One window for a batch of clips.

        in_spec (B, 128, S); in_text (B, T); carry (B, n_pre, pose_dim)
        previous window's tail (zeros for the first window); vids (B,).
        """
        cfg = self.cfg
        B, T = in_text.shape
        target = jnp.zeros((B, cfg.n_poses, self.spec.pose_dim))
        target = target.at[:, :cfg.n_pre_poses].set(carry)
        audio_vars = {"params": params["audio"],
                      "batch_stats": batch_stats["audio"]}
        _, _, _, _, blend = self.system.audio.apply(
            audio_vars, in_spec, vids, train=False)
        gen_apply = self.system._gen_apply(params["gens"], rng, train=False)
        outs, _, _, _, _ = run_cascade(gen_apply, self.spec, target, in_text,
                                       blend, vids, cfg.n_pre_poses)
        return outs[-1]

    def generate(self, audio: np.ndarray, words_per_clip: Sequence,
                 lang: Vocab, vids: np.ndarray,
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        """audio (B, n_samples) float32; words_per_clip: list of B word
        lists [(word, t0, t1)]; vids (B,) -> (B, total_frames, pose_dim)."""
        cfg = self.cfg
        B, n_samples = audio.shape
        clip_seconds = n_samples / SR
        unit_time, stride_time, num_sub = _window_layout(cfg, clip_seconds)
        spec_len = spectrogram_length_for(cfg.n_poses,
                                          cfg.motion_resampling_framerate)
        audio_len = int(unit_time * SR)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        # whole-clip mel once, on device (B, 128, S_total)
        full_spec = np.asarray(jax.vmap(log_mel_spectrogram)(
            jnp.asarray(audio)))
        S_total = full_spec.shape[2]

        out_list: list[np.ndarray] = []
        carry = np.zeros((B, cfg.n_pre_poses, self.spec.pose_dim), np.float32)
        vids_j = jnp.asarray(vids)
        for i in range(num_sub):
            start_time = i * stride_time
            end_time = start_time + unit_time
            # spectrogram window (synthesize_hierarchy.py:83-86); note the
            # reference indexes by time fraction of the spectrogram length
            s0 = math.floor(start_time / clip_seconds * S_total)
            s1 = s0 + spec_len
            if s1 > S_total:
                pad = s1 - S_total
                spec_w = np.pad(full_spec, ((0, 0), (0, 0), (0, pad)),
                                mode="edge")[:, :, s0:s1]
            else:
                spec_w = full_spec[:, :, s0:s1]

            text_w = np.stack([
                frame_aligned_word_indices(words, start_time, end_time,
                                           cfg.n_poses, lang)
                for words in words_per_clip])

            out = self._window_step(self.params, self.batch_stats,
                                    jnp.asarray(spec_w), jnp.asarray(text_w),
                                    jnp.asarray(carry), vids_j,
                                    jax.random.fold_in(rng, i))
            out = np.asarray(out)  # (B, T, D)
            carry = out[:, -cfg.n_pre_poses:]

            if out_list:
                # linear cross-fade over the n_pre overlap
                # (synthesize_hierarchy.py:153-162)
                last = out_list[-1][:, -cfg.n_pre_poses:]
                out_list[-1] = out_list[-1][:, :-cfg.n_pre_poses]
                n = cfg.n_pre_poses
                j = np.arange(n).reshape(1, n, 1)
                blend = last * (n - j) / (n + 1) + \
                    out[:, :n] * (j + 1) / (n + 1)
                out = np.concatenate([blend, out[:, n:]], axis=1)
            out_list.append(out)

        return np.concatenate(out_list, axis=1)


def polyfit_smooth(out_dir_vec: np.ndarray, cfg: Config) -> np.ndarray:
    """Cubic-polyfit smoothing across window joints for seq2seq outputs
    (synthesize.py:163-185).  out_dir_vec: (total_frames, D)."""
    n_smooth = cfg.n_pre_poses
    stride = cfg.n_poses - cfg.n_pre_poses
    total = out_dir_vec.shape[0]
    num_sub = max((total - cfg.n_poses) // stride + 1, 1)
    out = out_dir_vec.copy()
    for i in range(num_sub):
        start = cfg.n_pre_poses + i * stride - n_smooth
        if start < 0:
            start, end = 0, n_smooth * 2
        else:
            end = start + n_smooth * 3
        y = out[start:end]
        if y.shape[0] < 4:
            continue
        x = np.arange(y.shape[0])
        coeffs = np.polyfit(x, y, 3)
        out[start:end] = np.stack(
            [np.poly1d(coeffs[:, k])(x) for k in range(y.shape[1])], axis=1)
    return out


def fade_out_to_mean(out_dir_vec: np.ndarray, cfg: Config,
                     end_padding_duration_s: float) -> np.ndarray:
    """Quadratic-fit fade to the mean pose over the zero-padded tail
    (synthesize_hierarchy.py:189-213)."""
    n_smooth = cfg.n_pre_poses
    fps = cfg.motion_resampling_framerate
    start = len(out_dir_vec) - int(end_padding_duration_s * fps)
    end = start + n_smooth * 2
    out = out_dir_vec
    if len(out) < end:
        out = np.pad(out, [(0, end - len(out)), (0, 0)], mode="constant")
    out[end - n_smooth:] = 0.0
    y = out[start:end]
    x = np.arange(y.shape[0])
    w = np.ones(len(y))
    w[0] = w[-1] = 5
    coeffs = np.polyfit(x, y, 2, w=w)
    out[start:end] = np.stack(
        [np.poly1d(coeffs[:, k])(x) for k in range(y.shape[1])], axis=1)
    return out
