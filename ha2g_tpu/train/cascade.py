"""Coarse-to-fine hierarchy cascade.

Replaces the reference's hand-written per-level pre-seq blocks
(train_hierarchy.py:100-117 for 3 levels, train_hierarchy_expressive.py:
155-213 for 6) with one loop driven by SkeletonSpec routing tables.  The
level count is static, so the loop unrolls into one XLA graph; the
sequential dependency between levels is inherent to the model (each level's
pre-seq carries the previous level's output).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ha2g_tpu.skeleton import SkeletonSpec


def build_pre_seq(level_target: jnp.ndarray, prev_out, level: int,
                  spec: SkeletonSpec, n_pre: int) -> jnp.ndarray:
    """pre_seq for one level: first n_pre frames = ground truth + constraint
    bit, later frames = previous level's output routed to this level's bone
    positions (train_hierarchy.py:100-116).

    TPU-first formulation: the routing is one-to-one, so the fill is ONE
    matmul `prev @ routing_matrix` (single 0/1 entry per output column —
    copies values exactly in any dtype; precision='highest' keeps the f32
    path exact on the MXU's split-accumulate) plus a time-axis concat for
    the ground-truth prefix.  The previous `.at[dst].set(prev[..., src])`
    scatter cost ~14% of the chained 6-level cascade fwd+bwd — the
    scatter's transpose (backward) was the expensive part."""
    B, T, D = level_target.shape
    prefix = jnp.concatenate(
        [level_target[:, :n_pre],
         jnp.ones((B, n_pre, 1), level_target.dtype)], axis=2)
    if prev_out is None:
        suffix = jnp.zeros((B, T - n_pre, D + 1), level_target.dtype)
    else:
        route = jnp.asarray(spec.routing_matrix(level - 1),
                            prev_out.dtype)
        suffix = jnp.matmul(prev_out[:, n_pre:], route,
                            precision="highest")
    return jnp.concatenate([prefix, suffix], axis=1)


def run_cascade(gen_apply: Sequence[Callable], spec: SkeletonSpec,
                target: jnp.ndarray, in_text: jnp.ndarray,
                blend_feats: jnp.ndarray, vid_indices: jnp.ndarray,
                n_pre: int):
    """Run all hierarchy levels.

    gen_apply[l](pre_seq, in_text, audio_feat_seq, vid_indices) ->
        (out, z, mu, logvar) — a bound apply closure per level.
    target: (B, T, pose_dim) full-resolution dir vecs (only its level slices
        and first n_pre frames are consumed).
    blend_feats: (L, B, T, 32) speaker-blended audio features.
    Returns (outs per level, targets per level, z, mu, logvar of last level).
    """
    outs, targets = [], []
    prev = None
    z = mu = logvar = None
    for level in range(spec.n_levels):
        t_l = spec.extract_level_target(target, level)
        pre = build_pre_seq(t_l, prev, level, spec, n_pre)
        out, z, mu, logvar = gen_apply[level](pre, in_text,
                                              blend_feats[level], vid_indices)
        outs.append(out)
        targets.append(t_l)
        prev = out
    return outs, targets, z, mu, logvar
