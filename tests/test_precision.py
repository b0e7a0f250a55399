"""compute_dtype threading (ops/precision.py): leaf blocks follow the
context, params stay float32, systems stay dtype-stable, bf16 training
tracks fp32."""

import jax
import jax.numpy as jnp
import numpy as np

from ha2g_tpu.config import Config
from ha2g_tpu.models.common import BatchNorm, Conv1d, Dense
from ha2g_tpu.ops.gru import GRU
from ha2g_tpu.ops.precision import compute_dtype, precision, to_float32


def test_context_default_and_reset():
    assert compute_dtype() == jnp.float32
    with precision("bfloat16"):
        assert compute_dtype() == jnp.dtype(jnp.bfloat16)
        with precision(None):  # None = float32
            assert compute_dtype() == jnp.float32
        assert compute_dtype() == jnp.dtype(jnp.bfloat16)
    assert compute_dtype() == jnp.float32


def test_leaf_blocks_follow_context_params_stay_fp32():
    x = jnp.ones((2, 6, 8))
    for mod, args in ((Dense(4), (x,)), (Conv1d(4, 3), (x,)),
                      (GRU(hidden_size=4), (x,))):
        with precision("bfloat16"):
            v = mod.init(jax.random.PRNGKey(0), *args)
            out = mod.apply(v, *args)
        out0 = out[0] if isinstance(out, tuple) else out
        assert out0.dtype == jnp.bfloat16, type(mod)
        assert all(p.dtype == jnp.float32
                   for p in jax.tree_util.tree_leaves(v["params"])), type(mod)
        # explicit dtype field still wins over the context
        out_fp = mod.apply(v, *args)
        out_fp0 = out_fp[0] if isinstance(out_fp, tuple) else out_fp
        assert out_fp0.dtype == jnp.float32


def test_batchnorm_normalizes_in_fp32():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                    jnp.float32)
    m = BatchNorm(use_running_average=False)
    v = m.init(jax.random.PRNGKey(0), x)
    with precision("bfloat16"):
        out, mut = m.apply(v, x, mutable=["batch_stats"])
    assert out.dtype == jnp.bfloat16
    # running stats stay fp32
    assert all(s.dtype == jnp.float32
               for s in jax.tree_util.tree_leaves(mut["batch_stats"]))


def test_to_float32_casts_inexact_only():
    tree = {"a": jnp.ones((2,), jnp.bfloat16), "i": jnp.ones((2,), jnp.int32)}
    out = to_float32(tree)
    assert out["a"].dtype == jnp.float32 and out["i"].dtype == jnp.int32


def test_bf16_hierarchy_step_tracks_fp32():
    """One train step in each dtype from identical init: finite metrics,
    close losses, float32 state both ways."""
    rng = np.random.default_rng(0)
    B, T = 4, 34
    batch = {"text": jnp.asarray(rng.integers(0, 10, (B, T)), jnp.int32),
             "spec": jnp.asarray(rng.normal(size=(B, 128, 70)), jnp.float32),
             "audio": jnp.zeros((B, 36267), jnp.float32),
             "target": jnp.asarray(rng.normal(size=(B, T, 27)) * 0.1,
                                   jnp.float32),
             "vids": jnp.zeros((B,), jnp.int32)}
    results = {}
    states = {}
    from ha2g_tpu.train.hierarchy import HierarchySystem
    for dt in ("float32", "bfloat16"):
        cfg = Config(model="hierarchy", hidden_size=16, n_layers=2,
                     batch_size=B, compute_dtype=dt)
        s = HierarchySystem(cfg, n_words=12, n_speakers=3)
        st = s.init(jax.random.PRNGKey(0), batch)
        step = s.make_train_step(gan_on=True)
        st, m = step(st, batch, jax.random.PRNGKey(1))
        results[dt] = {k: float(v) for k, v in m.items()}
        states[dt] = st
        assert all(np.isfinite(v) for v in results[dt].values()), dt
        assert all(p.dtype == jnp.float32 for p in
                   jax.tree_util.tree_leaves((st.params, st.batch_stats))), dt
    for k in results["float32"]:
        a, b = results["float32"][k], results["bfloat16"][k]
        assert abs(a - b) <= 0.05 * max(abs(a), abs(b), 1.0), (k, a, b)
