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
