"""Numerical parity of the TPU GRU against torch.nn.GRU (CPU) with copied
weights — validates the exact cuDNN-compatible gate math the reference's
models depend on (hierarchy_net.py:87 et al.)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from ha2g_tpu.ops.gru import GRU, GRUCell


def _copy_torch_weights(tgru, n_layers, bidirectional):
    """Build a flax params dict from a torch GRU's weights."""
    D = 2 if bidirectional else 1
    params = {}
    for layer in range(n_layers):
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for d in range(D):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            w_ih.append(getattr(tgru, f"weight_ih{sfx}").detach().numpy().T)
            w_hh.append(getattr(tgru, f"weight_hh{sfx}").detach().numpy().T)
            b_ih.append(getattr(tgru, f"bias_ih{sfx}").detach().numpy())
            b_hh.append(getattr(tgru, f"bias_hh{sfx}").detach().numpy())
        params[f"w_ih_l{layer}"] = jnp.asarray(np.stack(w_ih))
        params[f"w_hh_l{layer}"] = jnp.asarray(np.stack(w_hh))
        params[f"b_ih_l{layer}"] = jnp.asarray(np.stack(b_ih))
        params[f"b_hh_l{layer}"] = jnp.asarray(np.stack(b_hh))
    return {"params": params}


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("n_layers", [1, 3])
def test_gru_matches_torch(bidirectional, n_layers):
    torch.manual_seed(0)
    B, T, IN, H = 3, 7, 11, 13
    tgru = torch.nn.GRU(IN, H, num_layers=n_layers, batch_first=True,
                        bidirectional=bidirectional)
    x = torch.randn(B, T, IN)
    with torch.no_grad():
        t_out, t_hn = tgru(x)

    model = GRU(hidden_size=H, n_layers=n_layers, bidirectional=bidirectional)
    params = _copy_torch_weights(tgru, n_layers, bidirectional)
    j_out, j_hn = model.apply(params, jnp.asarray(x.numpy()))

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_hn), t_hn.numpy(),
                               atol=1e-5, rtol=1e-5)


def test_gru_cell_matches_torch_step():
    torch.manual_seed(1)
    B, IN, H = 4, 9, 8
    tgru = torch.nn.GRU(IN, H, num_layers=2, batch_first=True)
    x = torch.randn(B, 1, IN)
    h0 = torch.randn(2, B, H)
    with torch.no_grad():
        t_out, t_hn = tgru(x, h0)

    cell = GRUCell(hidden_size=H, n_layers=2)
    params = {"params": {}}
    for layer in range(2):
        params["params"][f"w_ih_l{layer}"] = jnp.asarray(
            getattr(tgru, f"weight_ih_l{layer}").detach().numpy().T)
        params["params"][f"w_hh_l{layer}"] = jnp.asarray(
            getattr(tgru, f"weight_hh_l{layer}").detach().numpy().T)
        params["params"][f"b_ih_l{layer}"] = jnp.asarray(
            getattr(tgru, f"bias_ih_l{layer}").detach().numpy())
        params["params"][f"b_hh_l{layer}"] = jnp.asarray(
            getattr(tgru, f"bias_hh_l{layer}").detach().numpy())
    out, hn = cell.apply(params, jnp.asarray(x.numpy()[:, 0]),
                         jnp.asarray(h0.numpy()))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy()[:, 0],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), t_hn.numpy(),
                               atol=1e-5, rtol=1e-5)


def test_gru_init_and_grad_flow():
    model = GRU(hidden_size=16, n_layers=2, bidirectional=True, dropout=0.3)
    x = jnp.ones((2, 5, 8))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        out, _ = model.apply({"params": params}, x)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(np.any(np.asarray(l) != 0) for l in flat)


def test_gru_scan_custom_vjp_matches_autodiff():
    """The hand-derived backward (ops/gru.py:_gru_scan_bwd) must equal
    plain autodiff through the identical scan math."""
    from ha2g_tpu.ops import gru as G

    def plain_scan(xp, h0, w_hh, b_hh):
        def step(h, x_t):
            hh = jnp.einsum("dbh,dhg->dbg", h, w_hh) + b_hh[:, None, :]
            h_new, _ = G._gru_gates(x_t, hh, h)
            return h_new, h_new
        h_final, outs = jax.lax.scan(step, h0, xp)
        return outs, h_final

    rng = np.random.default_rng(0)
    T, D, B, H = 7, 2, 3, 5
    args = [jnp.asarray(rng.normal(size=s), jnp.float32)
            for s in [(T, D, B, 3 * H), (D, B, H), (D, H, 3 * H),
                      (D, 3 * H)]]
    co = jnp.asarray(rng.normal(size=(T, D, B, H)), jnp.float32)
    ch = jnp.asarray(rng.normal(size=(D, B, H)), jnp.float32)

    def loss(fn, *a):
        outs, hf = fn(*a)
        return jnp.sum(outs * co) + jnp.sum(hf * ch)

    g_auto = jax.grad(lambda *a: loss(plain_scan, *a),
                      argnums=(0, 1, 2, 3))(*args)
    g_custom = jax.grad(lambda *a: loss(G._gru_scan, *a),
                        argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_auto, g_custom):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=2e-6)
