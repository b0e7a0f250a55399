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
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _torch_rnn_init(hidden_size: int):
    """torch initializes all GRU weights/biases U(-1/sqrt(H), 1/sqrt(H))."""
    k = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init


def _gru_scan(xp: jnp.ndarray, h0: jnp.ndarray, w_hh: jnp.ndarray,
              b_hh: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the recurrent part of one GRU layer.

    xp:   (T, D, B, 3H) precomputed input projections (D = n_directions;
          direction 1, if present, is already time-reversed).
    h0:   (D, B, H) initial hidden.
    w_hh: (D, H, 3H), b_hh: (D, 3H).
    Returns (outputs (T, D, B, H), final hidden (D, B, H)).
    """
    H = h0.shape[-1]

    def step(h, x_t):
        hh = jnp.einsum("dbh,dhg->dbg", h, w_hh,
                        preferred_element_type=h.dtype) + b_hh[:, None, :]
        x_r, x_z, x_n = jnp.split(x_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(x_r + h_r)
        z = jax.nn.sigmoid(x_z + h_z)
        n = jnp.tanh(x_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    # unroll=4: ~25% faster on v5e for the 34-step HA2G sequences (loop
    # overhead dominates these small per-step matmuls); exact same math
    h_final, outs = jax.lax.scan(step, h0, xp, unroll=4)
    return outs, h_final


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
    dtype: jnp.dtype = jnp.float32
    # opt-in Pallas fused-recurrence kernel (ops/pallas_gru.py): bit-exact,
    # faster for small-batch (latency-bound) bidirectional inference
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        B, T, _ = x.shape
        D = 2 if self.bidirectional else 1
        H = self.hidden_size

        if h0 is None:
            h0 = jnp.zeros((self.n_layers * D, B, H), dtype=self.dtype)
        init = _torch_rnn_init(H)
        h_finals = []
        inp = x
        for layer in range(self.n_layers):
            in_dim = inp.shape[-1]

            def p(name, shape):
                return self.param(f"{name}_l{layer}", init, shape, self.dtype)

            w_ih = p("w_ih", (D, in_dim, 3 * H))
            w_hh = p("w_hh", (D, H, 3 * H))
            b_ih = p("b_ih", (D, 3 * H))
            b_hh = p("b_hh", (D, 3 * H))

            # hoisted input projection: one matmul over all timesteps
            xp = jnp.einsum("btd,ndg->tnbg", inp, w_ih,
                            preferred_element_type=self.dtype)
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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray,
                 deterministic: bool = True):
        """x: (B, in); h: (n_layers, B, H) -> (out (B, H), new h)."""
        H = self.hidden_size
        init = _torch_rnn_init(H)
        new_h = []
        inp = x
        for layer in range(self.n_layers):
            in_dim = inp.shape[-1]

            def p(name, shape):
                return self.param(f"{name}_l{layer}", init, shape, self.dtype)

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
