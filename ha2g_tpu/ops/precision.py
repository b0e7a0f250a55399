"""Compute-dtype threading (the config's ``compute_dtype`` field).

Mixed precision the TPU way: parameters, optimizer state, batch-norm
statistics, and losses stay float32; matmul/conv/scan *compute* runs in
the configured dtype (bfloat16 halves the HBM traffic of the
activation-bound GRU scans; the MXU is bf16-native).

Threading uses a context variable consulted by the leaf blocks
(models/common.py Dense/Conv/BatchNorm, ops/gru.py, ops/tcn weight-norm
convs) as their *default* dtype: the training systems wrap model.apply
in ``precision(cfg.compute_dtype)`` during tracing, so a single config
flag switches the whole jitted graph without plumbing a field through
every intermediate module.  Explicit ``dtype=`` on a module still wins.

Boundary rules (enforced by the systems):
* losses and metrics are computed on float32-cast model outputs
* BatchNorm always normalizes in float32 and casts back (flax keeps
  running stats in param dtype already)
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_compute_dtype: contextvars.ContextVar = contextvars.ContextVar(
    "ha2g_compute_dtype", default=jnp.float32)


def compute_dtype():
    """The active compute dtype (default float32)."""
    return _compute_dtype.get()


def resolve(dtype):
    """A module's effective dtype: its explicit field, else the context."""
    return compute_dtype() if dtype is None else dtype


@contextlib.contextmanager
def precision(dtype):
    """Set the compute dtype for model code traced inside this block.

    Accepts a dtype or a config string ('float32' / 'bfloat16' / ...).
    ``precision(None)`` / ``precision('float32')`` are no-ops.

    TRACE-TIME BINDING: the context variable is consulted while jax traces
    a function, and the chosen dtype is baked into the compiled program —
    it is NOT part of ``jax.jit``'s cache key.  Wrapping a *call* to an
    already-jitted function in ``precision(...)`` does nothing, and reusing
    one jitted closure under different precision contexts silently reuses
    the first trace's dtype.  The rule the training systems follow: open
    ``precision(cfg.compute_dtype)`` INSIDE the function being jitted, and
    build a fresh closure per config (``make_train_step`` does both), so
    each (system, dtype) pair owns its own jit cache entry.  User code that
    jits model calls directly must do the same — rebuild the jitted
    function when the compute dtype changes.
    """
    if dtype is None:
        dtype = jnp.float32
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    token = _compute_dtype.set(jnp.dtype(dtype))
    try:
        yield
    finally:
        _compute_dtype.reset(token)


def to_compute(x):
    """Cast an array to the active compute dtype."""
    return x.astype(compute_dtype()) if hasattr(x, "astype") else x


def to_float32(tree):
    """Cast every inexact leaf of a pytree to float32 (loss boundary)."""
    import jax

    def cast(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.inexact):
            return a.astype(jnp.float32)
        return a
    return jax.tree_util.tree_map(cast, tree)
