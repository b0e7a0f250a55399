"""Flash contrastive kernel vs the XLA formulation (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ha2g_tpu.ops import pallas_contrastive as pc
from ha2g_tpu.train import losses

N, D = 1024, 32


@pytest.fixture(autouse=True)
def _interpret():
    pc.INTERPRET = True
    yield
    pc.INTERPRET = False


def _norm(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_flash_value_matches_xla():
    rng = np.random.default_rng(0)
    a = jnp.asarray(_norm(rng.normal(size=(N, D))).astype(np.float32))
    b = jnp.asarray(_norm(rng.normal(size=(N, D))).astype(np.float32))
    want = float(losses._contrastive_core(a, b))
    got = float(pc.flash_contrastive(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_flash_grads_match_xla():
    rng = np.random.default_rng(1)
    a = jnp.asarray(_norm(rng.normal(size=(N, D))).astype(np.float32))
    b = jnp.asarray(_norm(rng.normal(size=(N, D))).astype(np.float32))
    ga = jax.grad(pc.flash_contrastive, argnums=(0, 1))(a, b)
    gr = jax.grad(losses._contrastive_core, argnums=(0, 1))(a, b)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6, rtol=1e-3)
