"""Loss functions shared across training strategies.

Rebuilds of the reference loss math (scripts/train_eval/*):

* scaled Huber via the smooth_l1(x/beta, y/beta)*beta trick (train_gan.py:54)
* softmax contrastive on inverse L2 similarity (train_hierarchy.py:23-68) —
  computed via the ||a-b||^2 = 2 - 2<a,b> expansion on L2-normalized rows so
  the (N, N, D) difference tensor the reference materializes never exists;
  one (N, D) @ (D, N) MXU matmul instead.
* speaker KLD (train_gan.py:81), diversity regularizer (train_gan.py:68-77),
  ns-GAN (train_gan.py:41,56), physical angle prior (train_hierarchy.py:242-262)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ha2g_tpu.skeleton import SkeletonSpec


def scaled_huber(pred, target, beta: float = 0.1, reduce: bool = True):
    """torch F.smooth_l1_loss(pred/beta, target/beta) * beta."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(loss) if reduce else loss


def softmax_contrastive(feat_a, feat_b, eps: float = 1e-8):
    """CE over inverse-L2 similarity with diagonal labels
    (SoftmaxContrastiveLoss, train_hierarchy.py:54-68).

    feat_a/feat_b: (N, D) per-frame features (N = B*T).
    """
    a = feat_a / jnp.maximum(jnp.linalg.norm(feat_a, axis=1, keepdims=True), eps)
    b = feat_b / jnp.maximum(jnp.linalg.norm(feat_b, axis=1, keepdims=True), eps)
    # ||a_i - b_j||^2 = |a|^2 + |b|^2 - 2 a.b ; rows are unit norm
    sq = jnp.maximum(2.0 - 2.0 * (a @ b.T), 0.0)
    dist = jnp.sqrt(sq + 1e-12)
    sim = 1.0 / (dist + eps)
    sim = jnp.maximum(sim, eps)
    logits = sim  # reference feeds similarities directly into cross_entropy
    labels = jnp.arange(a.shape[0])
    logz = jax.nn.logsumexp(logits, axis=1)
    return jnp.mean(logz - jnp.take_along_axis(logits, labels[:, None], 1)[:, 0])


def speaker_kld(mu, logvar):
    """-0.5 mean(1 + logvar - mu^2 - e^logvar)  (train_gan.py:81)."""
    return -0.5 * jnp.mean(1.0 + logvar - mu ** 2 - jnp.exp(logvar))


def diversity_regularizer(out, out_rand, z, z_rand, beta: float = 0.05):
    """-(pose_l1 / z_l1) clamped at -1000 (train_gan.py:68-77).

    Gradient flows only through `out` (the others are detached as in the
    reference).
    """
    out_rand = jax.lax.stop_gradient(out_rand)
    z = jax.lax.stop_gradient(z)
    z_rand = jax.lax.stop_gradient(z_rand)
    pose_l1 = scaled_huber(out, out_rand, beta=beta, reduce=False)
    pose_l1 = pose_l1.sum(axis=(1, 2))          # (B,)
    z_l1 = jnp.abs(z - z_rand).mean(axis=1)     # (B,)
    div = -(pose_l1 / (z_l1 + 1e-5))
    return jnp.mean(jnp.maximum(div, -1000.0))


def nsgan_d_loss(d_real, d_fake, eps: float = 1e-8):
    """-mean(log D(real) + log(1 - D(fake)))  (train_gan.py:41)."""
    return -jnp.mean(jnp.log(d_real + eps) + jnp.log(1.0 - d_fake + eps))


def nsgan_g_loss(d_fake, eps: float = 1e-8):
    return -jnp.mean(jnp.log(d_fake + eps))


def physical_angle_prior(out_dir_vec, mean_dir_vec, spec: SkeletonSpec):
    """Gaussian prior over inter-bone angles (train_hierarchy.py:242-262,
    train_hierarchy_expressive.py:424-449).  out_dir_vec: (B, T, pose_dim)
    mean-subtracted prediction."""
    prior = spec.angle_prior
    assert prior is not None
    raw = out_dir_vec + mean_dir_vec[None, None, :]
    vecs = spec.extended_dir_vecs(raw)              # (B, T, n_ext, 3) unit
    flat = vecs.reshape(-1, vecs.shape[-2], 3)
    i = jnp.asarray([p[0] for p in prior.pairs])
    j = jnp.asarray([p[1] for p in prior.pairs])
    inner = jnp.einsum("npd,npd->np", flat[:, i], flat[:, j])
    inner = jnp.clip(inner, -1.0 + 1e-7, 1.0 - 1e-7)
    angle = jnp.arccos(inner) / math.pi             # (N, n_pairs)
    avg = jnp.asarray(prior.avg)
    var = jnp.asarray(prior.var)
    # reference sums mean-per-pair losses
    return jnp.sum(jnp.mean((angle - avg) ** 2 / (2.0 * var), axis=0))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))
