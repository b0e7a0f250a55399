"""Flash-style Pallas kernel for the softmax contrastive loss.

The HA2G contrastive loss (train/losses.py::softmax_contrastive, reference
train_hierarchy.py:23-68) is CE over an (N, N) inverse-L2 similarity matrix
with N = batch*frames (8704 at the reference batch size).  This kernel
streams the logits flash-attention style — row tiles x column tiles with an
online logsumexp — so no (N, N) tensor ever exists:

  forward:  grid (R, C), C minor; per row tile keep running (max, sumexp,
            diag) in VMEM scratch; emit per-row logsumexp + diagonal.
  backward: dL/ds_ij = (softmax_ij - I_ij)/N chained through the
            sim = clamp(1/(dist+eps)) and dist = sqrt(clamp(2-2s)) algebra,
            recomputed tile-by-tile; two accumulation kernels produce
            dA (C minor) and dB (R minor).

Rows are assumed L2-normalized (the wrapper in train/losses.py normalizes);
N must be a multiple of the 512 tile (true for the reference shapes:
256*34 = 8704 = 17*512); other sizes fall back to the XLA path.

Measured on v5e at N=8704, D=32: bit-exact vs the XLA custom-VJP path
(value rtol<1e-6, grad maxerr ~1e-10) and time-equal (~3 ms pipelined grad
for both — XLA already fuses the elementwise chain into the matmul
epilogue at this size, so the kernel's value is O(N) memory instead of
O(N^2): it keeps the loss viable at batch sizes where the (N, N) tensors
would no longer fit alongside activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512
EPS = 1e-8
INTERPRET = False  # set True to run kernels in interpreter mode (tests)


def _logits_tile(a_tile, b_tile):
    """(TM, D) x (TN, D) -> inverse-L2 logits (TM, TN) + residuals."""
    s = jax.lax.dot_general(a_tile, b_tile,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    sq = jnp.maximum(2.0 - 2.0 * s, 0.0)
    dist = jnp.sqrt(sq + 1e-12)
    logits = jnp.maximum(1.0 / (dist + EPS), EPS)
    return logits, dist, s


def _fwd_kernel(a_ref, b_ref, logz_ref, diag_ref, m_scr, s_scr, d_scr):
    r, c = pl.program_id(0), pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)
        d_scr[:] = jnp.zeros_like(d_scr)

    logits, _, _ = _logits_tile(a_ref[:], b_ref[:])

    # online logsumexp over this column tile
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    s_scr[:] = s_scr[:] * jnp.exp(m_prev - m_new) + \
        jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new

    # diagonal contribution when this tile crosses it
    gi = r * logits.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 0)
    gj = c * logits.shape[1] + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 1)
    d_scr[:] += jnp.sum(jnp.where(gi == gj, logits, 0.0), axis=1,
                        keepdims=True)

    @pl.when(c == n_c - 1)
    def _():
        logz_ref[:] = m_scr[:] + jnp.log(s_scr[:])
        diag_ref[:] = d_scr[:]


def _ds_tile(a_tile, b_tile, logz_tile, r, c, n, g_over_n):
    """Recompute dL/ds for one tile."""
    logits, dist, s = _logits_tile(a_tile, b_tile)
    gi = r * a_tile.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 0)
    gj = c * b_tile.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 1)
    eye = (gi == gj).astype(jnp.float32)
    dlogits = (jnp.exp(logits - logz_tile) - eye) * g_over_n
    active = (logits > EPS) & (2.0 - 2.0 * s > 0.0)
    return jnp.where(active, dlogits / ((dist + EPS) ** 2 * dist), 0.0)


def _bwd_da_kernel(a_ref, b_ref, logz_ref, g_ref, da_ref, acc):
    r, c = pl.program_id(0), pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    ds = _ds_tile(a_ref[:], b_ref[:], logz_ref[:], r, c,
                  n_c * b_ref.shape[0], g_ref[0, 0])
    acc[:] += jax.lax.dot_general(ds, b_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(c == n_c - 1)
    def _():
        da_ref[:] = acc[:]


def _bwd_db_kernel(a_ref, b_ref, logz_ref, g_ref, db_ref, acc):
    # grid (C, R): R minor so the dB column tile accumulates in scratch
    c, r = pl.program_id(0), pl.program_id(1)
    n_r = pl.num_programs(1)

    @pl.when(r == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    ds = _ds_tile(a_ref[:], b_ref[:], logz_ref[:], r, c,
                  n_r * a_ref.shape[0], g_ref[0, 0])
    acc[:] += jax.lax.dot_general(ds, a_ref[:], (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(r == n_r - 1)
    def _():
        db_ref[:] = acc[:]


def supported(n: int, d: int) -> bool:
    """Whether the kernel's tiling covers this problem size."""
    return n % TILE == 0 and d <= 512


def _flash_fwd_arrays(a, b):
    N, D = a.shape
    R = C = N // TILE
    vm = lambda shape, imap: pl.BlockSpec(shape, imap,
                                          memory_space=pltpu.VMEM)
    logz, diag = pl.pallas_call(
        _fwd_kernel,
        grid=(R, C),
        in_specs=[vm((TILE, D), lambda r, c: (r, 0)),
                  vm((TILE, D), lambda r, c: (c, 0))],
        out_specs=[vm((TILE, 1), lambda r, c: (r, 0)),
                   vm((TILE, 1), lambda r, c: (r, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((TILE, 1), jnp.float32)] * 3,
        interpret=INTERPRET,
    )(a, b)
    return logz, diag


@jax.custom_vjp
def flash_contrastive(a, b):
    """CE(diag) over inverse-L2 logits; a, b (N, D) L2-normalized rows."""
    logz, diag = _flash_fwd_arrays(a, b)
    return jnp.mean(logz - diag)


def _flash_fwd(a, b):
    logz, diag = _flash_fwd_arrays(a, b)
    return jnp.mean(logz - diag), (a, b, logz)


def _flash_bwd(res, g):
    a, b, logz = res
    N, D = a.shape
    R = C = N // TILE
    g_arr = jnp.full((1, 1), g / N, jnp.float32)
    vm = lambda shape, imap: pl.BlockSpec(shape, imap,
                                          memory_space=pltpu.VMEM)
    da = pl.pallas_call(
        _bwd_da_kernel,
        grid=(R, C),
        in_specs=[vm((TILE, D), lambda r, c: (r, 0)),
                  vm((TILE, D), lambda r, c: (c, 0)),
                  vm((TILE, 1), lambda r, c: (r, 0)),
                  pl.BlockSpec((1, 1), lambda r, c: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=vm((TILE, D), lambda r, c: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, D), jnp.float32)],
        interpret=INTERPRET,
    )(a, b, logz, g_arr)
    db = pl.pallas_call(
        _bwd_db_kernel,
        grid=(C, R),
        in_specs=[vm((TILE, D), lambda c, r: (r, 0)),
                  vm((TILE, D), lambda c, r: (c, 0)),
                  vm((TILE, 1), lambda c, r: (r, 0)),
                  pl.BlockSpec((1, 1), lambda c, r: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=vm((TILE, D), lambda c, r: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, D), jnp.float32)],
        interpret=INTERPRET,
    )(a, b, logz, g_arr)
    return da, db


flash_contrastive.defvjp(_flash_fwd, _flash_bwd)
