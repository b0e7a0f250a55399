"""Dataset statistics tools.

Rebuilds of the reference's offline stat scripts:
* motion_stats — mean_pose / mean_dir_vec / mean bone lengths over clips
  (scripts/calculate_motion_stats.py:12-51): the constants baked into the
  YAML configs.
* angle_stats — per-angle-pair mean / var / mean |frame change|
  (scripts/calculate_angle_stats.py:39-197): the physical-prior and
  beat-consistency constants in skeleton.py.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import jax.numpy as jnp

from ha2g_tpu.data.dataset import resample_pose_seq
from ha2g_tpu.skeleton import SkeletonSpec


def motion_stats(clips: Iterable[dict], spec: SkeletonSpec,
                 fps: int = 15) -> dict:
    """Returns mean_pose (n_joints*3), mean_dir_vec (n_bones*3) of UNIT
    vectors, and mean bone lengths from raw (un-normalized) skeletons."""
    pose_sum = np.zeros((spec.n_joints, 3))
    unit_sum = np.zeros((spec.n_bones, 3))
    len_sum = np.zeros(spec.n_bones)
    n = 0
    for clip in clips:
        skel = resample_pose_seq(
            np.asarray(clip["skeletons_3d"], np.float32),
            clip["end_time"] - clip["start_time"], fps)
        skel = skel.reshape(len(skel), spec.n_joints, 3)
        d = skel[:, spec.children] - skel[:, spec.parents]
        norm = np.linalg.norm(d, axis=-1)
        unit = d / np.maximum(norm[..., None], 1e-12)
        pose_sum += skel.sum(0)
        unit_sum += unit.sum(0)
        len_sum += norm.sum(0)
        n += len(skel)
    return {
        "mean_pose": (pose_sum / n).reshape(-1),
        "mean_dir_vec": (unit_sum / n).reshape(-1),
        "mean_bone_lengths": len_sum / n,
        "n_frames": n,
    }


def angle_stats(targets: np.ndarray, mean_dir_vec: np.ndarray,
                spec: SkeletonSpec) -> dict:
    """targets: (N, T, pose_dim) mean-subtracted dir vecs.  Returns per-pair
    avg_angle / var_angle / change_angle over the extended (cross-product-
    augmented) vector set — the source of the constants in
    skeleton.AnglePrior."""
    prior = spec.angle_prior
    assert prior is not None
    raw = targets + mean_dir_vec.reshape(1, 1, -1)
    vecs = np.asarray(spec.extended_dir_vecs(jnp.asarray(raw)))
    i = np.asarray([p[0] for p in prior.pairs])
    j = np.asarray([p[1] for p in prior.pairs])
    inner = np.clip(np.einsum("btpd,btpd->btp", vecs[:, :, i],
                              vecs[:, :, j]), -1.0, 1.0)
    angle = np.arccos(inner) / math.pi          # (N, T, P)
    flat = angle.reshape(-1, angle.shape[-1])
    return {
        "avg_angle": flat.mean(0),
        "var_angle": flat.var(0),
        "change_angle": np.abs(np.diff(angle, axis=1)).mean((0, 1)),
    }


# ---------------------------------------------------------------------------
# librosa golden fixtures (DSP parity protocol)
# ---------------------------------------------------------------------------

def librosa_golden_signals(sr: int = 16000) -> dict[str, np.ndarray]:
    """Deterministic fixture signals shared by the golden generator and the
    parity tests: a click train, a chirp, band-limited noise, speech-like
    AM noise, and silence-with-bursts — the cases that exercise mel
    triangle edges, dB flooring, and onset peak picking."""
    rng = np.random.default_rng(20260816)
    t = np.arange(4 * sr) / sr
    sig = {}
    clicks = np.zeros(4 * sr, np.float32)
    clicks[(np.arange(8) * 0.5 * sr + 0.25 * sr).astype(int)] = 1.0
    sig["clicks"] = clicks
    sig["chirp"] = np.sin(
        2 * np.pi * (200 * t + (3800 / 8.0) * t ** 2)).astype(np.float32)
    sig["noise"] = (rng.normal(size=4 * sr) * 0.3).astype(np.float32)
    am = (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))
    sig["am_noise"] = (rng.normal(size=4 * sr) * am * 0.4).astype(np.float32)
    bursts = np.zeros(4 * sr, np.float32)
    for s0 in (0.5, 1.7, 2.9):
        i0 = int(s0 * sr)
        bursts[i0:i0 + sr // 10] = rng.normal(size=sr // 10) * 0.8
    sig["bursts"] = bursts
    return sig


def make_librosa_goldens(out_path: str) -> str:
    """Generate the golden npz AGAINST LIBROSA ITSELF (requires the
    `librosa` package, 0.8.x — the version the reference pins).  Run once
    in such an env and commit the npz at tests/fixtures/librosa_goldens.npz;
    tests/test_mel_oracles.py then asserts <1e-2 dB mel parity and equal
    onset times against it.  Reference call sites:
    scripts/utils/data_utils.py:34-38 (melspectrogram + power_to_db),
    scripts/train.py:440 (onset_detect)."""
    import librosa  # deliberate hard dep: goldens must come from librosa

    sigs = librosa_golden_signals()
    out: dict[str, np.ndarray] = {"librosa_version":
                                  np.str_(librosa.__version__)}
    for name, y in sigs.items():
        mel = librosa.feature.melspectrogram(
            y=y, sr=16000, n_fft=1024, hop_length=512, power=2)
        out[f"{name}/mel_db"] = librosa.power_to_db(mel, ref=np.max)
        out[f"{name}/onset_env"] = librosa.onset.onset_strength(y=y, sr=16000)
        out[f"{name}/onset_times"] = librosa.onset.onset_detect(
            y=y, sr=16000, units="time")
    np.savez(out_path, **out)
    return out_path
