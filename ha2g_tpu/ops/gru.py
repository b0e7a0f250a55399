"""TPU-native multi-layer bidirectional GRU.

Replaces the reference's cuDNN `nn.GRU` (e.g. hierarchy_net.py:87, 4-layer
bi-GRU(300) over 34 steps — the hot op of HA2G training, run 3x per train
iteration through the level cascade).

Design for the MXU:
* The input projection for ALL timesteps and BOTH directions is one large
  batched matmul (B*T, in) @ (in, 3H) hoisted out of the recurrence.
* The recurrence is a single `lax.scan` whose carry is the hidden state for
  both directions stacked on a leading axis: per step one batched matmul
  (2, B, H) @ (2, H, 3H).  The backward direction consumes the time-reversed
  input stream, so forward+backward share one scan instead of two.
* Gate math follows torch.nn.GRU exactly (gate order r, z, n; the reset gate
  multiplies the *projected* hidden-new term):
    r = sigmoid(x_r + h_r); z = sigmoid(x_z + h_z)
    n = tanh(x_n + r * h_n); h' = (1 - z) * n + z * h
* Inter-layer dropout on layer outputs (all but last), as torch does.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# scan unroll factor: loop overhead dominates these small per-step matmuls
# (34-step sequences), so unrolling helps until instruction-cache/compile
# costs bite.  4 measured ~25% faster than 1 on v5e round 1; bench_gru.py
# sweeps {1,2,4,8,17,34} to re-validate per hardware.  Env override is for
# benchmarking only — production paths read the default.
_UNROLL = int(os.environ.get("HA2G_GRU_UNROLL", "4"))


def _torch_rnn_init(hidden_size: int):
    """torch initializes all GRU weights/biases U(-1/sqrt(H), 1/sqrt(H))."""
    k = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init


def _gru_gates(x_t, hh, h):
    """torch-order GRU gate math given input/hidden projections."""
    x_r, x_z, x_n = jnp.split(x_t, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(hh, 3, axis=-1)
    r = jax.nn.sigmoid(x_r + h_r)
    z = jax.nn.sigmoid(x_z + h_z)
    n = jnp.tanh(x_n + r * h_n)
    return (1.0 - z) * n + z * h, (r, z, n, h_n)


@jax.custom_vjp
def _gru_scan(xp: jnp.ndarray, h0: jnp.ndarray, w_hh: jnp.ndarray,
              b_hh: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the recurrent part of one GRU layer.

    xp:   (T, D, B, 3H) precomputed input projections (D = n_directions;
          direction 1, if present, is already time-reversed).
    h0:   (D, B, H) initial hidden.
    w_hh: (D, H, 3H), b_hh: (D, 3H).
    Returns (outputs (T, D, B, H), final hidden (D, B, H)).

    Differentiation uses a hand-derived VJP: XLA's default scan transpose
    stores every gate intermediate per step and re-materializes the whole
    chain, which made the backward dominate the flagship train step
    (STATUS round 1: ~5x bwd/fwd).  Here the backward scan keeps a single
    extra residual (the hidden-side projections hh), recomputes the gates
    elementwise, does exactly ONE matmul per step (d_gates @ w_hh^T —
    matching the forward's one matmul), and hoists the weight-gradient
    contraction out of the loop as one big MXU-friendly einsum.
    """
    def step(h, x_t):
        hh = jnp.einsum("dbh,dhg->dbg", h, w_hh,
                        preferred_element_type=h.dtype) + b_hh[:, None, :]
        h_new, _ = _gru_gates(x_t, hh, h)
        return h_new, h_new

    h_final, outs = jax.lax.scan(step, h0, xp, unroll=_UNROLL)
    return outs, h_final


def _gru_scan_fwd(xp, h0, w_hh, b_hh):
    def step(h, x_t):
        hh = jnp.einsum("dbh,dhg->dbg", h, w_hh,
                        preferred_element_type=h.dtype) + b_hh[:, None, :]
        h_new, _ = _gru_gates(x_t, hh, h)
        return h_new, (h_new, hh)

    h_final, (outs, hh_seq) = jax.lax.scan(step, h0, xp, unroll=_UNROLL)
    return (outs, h_final), (xp, h0, w_hh, outs, hh_seq)


def _gru_scan_bwd(res, cts):
    xp, h0, w_hh, outs, hh_seq = res
    d_outs, d_hfinal = cts
    h_prev_seq = jnp.concatenate([h0[None], outs[:-1]], axis=0)

    def step(dh, inputs):
        x_t, hh, h_prev, g_out = inputs
        g = dh + g_out
        _, (r, z, n, h_n) = _gru_gates(x_t, hh, h_prev)  # elementwise only
        # h' = (1-z) n + z h_prev;  n = tanh(x_n + r h_n)
        d_pre_n = g * (1.0 - z) * (1.0 - n * n)
        d_pre_z = g * (h_prev - n) * z * (1.0 - z)
        d_pre_r = d_pre_n * h_n * r * (1.0 - r)
        d_gx = jnp.concatenate([d_pre_r, d_pre_z, d_pre_n], axis=-1)
        d_gh = jnp.concatenate([d_pre_r, d_pre_z, d_pre_n * r], axis=-1)
        dh_prev = g * z + jnp.einsum("dbg,dhg->dbh", d_gh, w_hh,
                                     preferred_element_type=g.dtype)
        return dh_prev, (d_gx, d_gh)

    d_h0, (d_gx, d_gh) = jax.lax.scan(
        step, d_hfinal, (xp, hh_seq, h_prev_seq, d_outs),
        reverse=True, unroll=_UNROLL)
    # weight/bias gradients as single hoisted contractions; accumulate in
    # float32 even when the compute dtype is bf16 (t*b is a long axis)
    d_w_hh = jnp.einsum("tdbh,tdbg->dhg", h_prev_seq, d_gh,
                        preferred_element_type=jnp.float32
                        ).astype(d_gh.dtype)
    d_b_hh = d_gh.astype(jnp.float32).sum(axis=(0, 2)).astype(d_gh.dtype)
    return d_gx, d_h0, d_w_hh, d_b_hh


_gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)


class GRU(nn.Module):
    """Multi-layer (optionally bidirectional) GRU, batch-first.

    Input (B, T, in) -> output (B, T, H * n_directions) with the same layout
    as torch.nn.GRU(batch_first=True): [..., :H] forward, [..., H:] backward.
    Also returns the final hidden state (n_layers * n_directions, B, H) in
    torch's layer-major, direction-minor order.
    """

    hidden_size: int
    n_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # compute dtype; None = context
    # opt-in Pallas fused-recurrence kernel (ops/pallas_gru.py): bit-exact,
    # faster for small-batch (latency-bound) bidirectional inference
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        from ha2g_tpu.ops.precision import resolve
        B, T, _ = x.shape
        D = 2 if self.bidirectional else 1
        H = self.hidden_size
        cdt = resolve(self.dtype)

        if h0 is None:
            h0 = jnp.zeros((self.n_layers * D, B, H), dtype=cdt)
        init = _torch_rnn_init(H)
        h_finals = []
        inp = x.astype(cdt)
        for layer in range(self.n_layers):
            in_dim = inp.shape[-1]

            def p(name, shape):
                # params stay float32; cast to the compute dtype at use
                return self.param(f"{name}_l{layer}", init, shape,
                                  jnp.float32).astype(cdt)

            w_ih = p("w_ih", (D, in_dim, 3 * H))
            w_hh = p("w_hh", (D, H, 3 * H))
            b_ih = p("b_ih", (D, 3 * H))
            b_hh = p("b_hh", (D, 3 * H))

            # hoisted input projection: one matmul over all timesteps
            xp = jnp.einsum("btd,ndg->tnbg", inp, w_ih,
                            preferred_element_type=cdt)
            xp = xp + b_ih[None, :, None, :]
            if D == 2:
                # reverse the time stream feeding the backward direction
                xp = jnp.concatenate(
                    [xp[:, :1], xp[::-1, 1:]], axis=1)

            h0_layer = h0[layer * D:(layer + 1) * D]
            if self.use_pallas and D == 2:
                from ha2g_tpu.ops.pallas_gru import gru_sequence
                outs = gru_sequence(xp, h0_layer, w_hh, b_hh)
                h_f = outs[-1]
            else:
                outs, h_f = _gru_scan(xp, h0_layer, w_hh, b_hh)
            h_finals.append(h_f)

            if D == 2:
                fwd = outs[:, 0]
                bwd = outs[::-1, 1]
                layer_out = jnp.concatenate([fwd, bwd], axis=-1)  # (T, B, 2H)
            else:
                layer_out = outs[:, 0]
            inp = jnp.transpose(layer_out, (1, 0, 2))  # (B, T, D*H)

            if self.dropout > 0.0 and layer < self.n_layers - 1:
                inp = nn.Dropout(rate=self.dropout)(
                    inp, deterministic=deterministic)

        h_n = jnp.concatenate(h_finals, axis=0)  # (n_layers*D, B, H)
        return inp, h_n


class GRUCell(nn.Module):
    """Single-step GRU cell stack (unidirectional), used by the seq2seq
    attention decoder which must interleave attention with the recurrence
    (reference seq2seq_net.py:127,181)."""

    hidden_size: int
    n_layers: int = 1
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # compute dtype; None = context

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray,
                 deterministic: bool = True):
        """x: (B, in); h: (n_layers, B, H) -> (out (B, H), new h)."""
        from ha2g_tpu.ops.precision import resolve
        H = self.hidden_size
        init = _torch_rnn_init(H)
        cdt = resolve(self.dtype)
        new_h = []
        inp = x.astype(cdt)
        h = h.astype(cdt)
        for layer in range(self.n_layers):
            in_dim = inp.shape[-1]

            def p(name, shape):
                return self.param(f"{name}_l{layer}", init, shape,
                                  jnp.float32).astype(cdt)

            w_ih = p("w_ih", (in_dim, 3 * H))
            w_hh = p("w_hh", (H, 3 * H))
            b_ih = p("b_ih", (3 * H,))
            b_hh = p("b_hh", (3 * H,))

            xp = inp @ w_ih + b_ih
            hh = h[layer] @ w_hh + b_hh
            x_r, x_z, x_n = jnp.split(xp, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(hh, 3, axis=-1)
            r = jax.nn.sigmoid(x_r + h_r)
            z = jax.nn.sigmoid(x_z + h_z)
            n = jnp.tanh(x_n + r * h_n)
            h_new = (1.0 - z) * n + z * h[layer]
            new_h.append(h_new)
            inp = h_new
            if self.dropout > 0.0 and layer < self.n_layers - 1:
                inp = nn.Dropout(rate=self.dropout)(
                    inp, deterministic=deterministic)
        return inp, jnp.stack(new_h, axis=0)
