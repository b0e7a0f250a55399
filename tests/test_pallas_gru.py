"""Pallas GRU kernel vs the XLA scan formulation (interpret mode on CPU;
the compiled kernel is exercised on the real TPU by bench/profile runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ha2g_tpu.ops.pallas_gru import (_pallas_forward, gru_sequence,
                                     gru_sequence_reference)

T, D, B, H = 7, 2, 4, 16


def _inputs(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    xp = jax.random.normal(ks[0], (T, D, B, 3 * H)) * 0.5
    h0 = jax.random.normal(ks[1], (D, B, H)) * 0.5
    w_hh = jax.random.normal(ks[2], (D, H, 3 * H)) * 0.1
    b_hh = jax.random.normal(ks[3], (D, 3 * H)) * 0.1
    return xp, h0, w_hh, b_hh


def test_pallas_matches_scan_interpret():
    xp, h0, w_hh, b_hh = _inputs()
    want = gru_sequence_reference(xp, h0, w_hh, b_hh)
    got = _pallas_forward(xp, h0, w_hh, b_hh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_custom_vjp_gradients_match_scan():
    xp, h0, w_hh, b_hh = _inputs(1)

    def loss_pallas(xp, h0, w, b):
        # interpret-mode forward via monkeypatched path: use the reference
        # forward for the value, but route gradients through the custom_vjp
        out = gru_sequence_reference(xp, h0, w, b)
        return jnp.sum(out ** 2)

    def loss_ref(xp, h0, w, b):
        out = gru_sequence_reference(xp, h0, w, b)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xp, h0, w_hh, b_hh)

    # the custom bwd re-runs the scan vjp, so grads must match exactly
    from ha2g_tpu.ops import pallas_gru
    orig = pallas_gru._pallas_forward
    pallas_gru._pallas_forward = lambda *a, **k: orig(*a, interpret=True)
    try:
        def loss_k(xp, h0, w, b):
            return jnp.sum(gru_sequence(xp, h0, w, b) ** 2)
        g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3))(xp, h0, w_hh, b_hh)
    finally:
        pallas_gru._pallas_forward = orig

    for a, b in zip(g_ref, g_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
