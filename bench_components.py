"""Component-level attribution of the expressive train step (VERDICT r4
item 5): slope-timed fwd and fwd+bwd of each constituent module at the
flagship TED-Expressive shape (bs 96, hidden 300, 4 layers, 6 levels,
bf16), so the 19.8%-of-peak step MFU can be split into per-component
utilizations instead of guessed at.

Usage: python bench_components.py [dataset]
"""

import sys
import time
from functools import lru_cache

import numpy as np


def _slope(fn_for_n, n_lo=10, n_hi=40):
    import jax.numpy as jnp

    def run(n):
        f = fn_for_n(n)
        t0 = time.perf_counter()
        out = f()
        float(jnp.sum(out))
        return time.perf_counter() - t0

    run(n_lo); run(n_hi)
    lo = min(run(n_lo) for _ in range(3))
    hi = min(run(n_hi) for _ in range(3))
    return (hi - lo) / (n_hi - n_lo)


def _chain(apply_fn, seed_arg):
    """Build fn_for_n: n chained applications (a scalar carry perturbs
    every float leaf of the seed arg so XLA cannot hoist, batch, or elide
    iterations)."""
    import jax
    import jax.numpy as jnp

    @lru_cache(maxsize=None)
    def for_n(n):
        @jax.jit
        def f():
            def body(c, _):
                arg = jax.tree_util.tree_map(
                    lambda x: x + c.astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    seed_arg)
                out = apply_fn(arg)
                return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-6, None
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return out
        return f
    return for_n


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "ted_expressive"
    import jax
    import jax.numpy as jnp
    from ha2g_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _make_system, _batch
    from ha2g_tpu.ops.precision import precision
    from ha2g_tpu.utils.roofline import compiled_flops

    B = 96 if dataset == "ted_expressive" else 256
    system, cfg = _make_system(dataset, hidden=300, n_layers=4)
    batch = _batch(cfg, B)
    state = system.init(jax.random.PRNGKey(0), batch)
    params, stats = state.params, state.batch_stats
    spec_in = batch["spec"]
    rng = jax.random.PRNGKey(7)
    L = system.spec.n_levels
    PEAK = 197e12  # TPU v5 lite bf16

    rows = []

    def report(name, t, flops=None):
        line = f"[comp {dataset} bs{B}] {name}: {t * 1e3:8.2f} ms"
        if flops:
            line += (f"  ({flops / 1e9:7.1f} GFLOP, "
                     f"{flops / t / 1e12:5.1f} TFLOP/s = "
                     f"{100 * flops / t / PEAK:4.1f}% peak)")
        print(line, flush=True)
        rows.append((name, t))

    # ---- audio encoder (SE-ResNet34V2) ----
    def audio_fwd(s):
        with precision(cfg.compute_dtype):
            res = system.audio.apply(
                {"params": params["audio"], "batch_stats": stats["audio"]},
                s, batch["vids"], train=False)
        return res[3]  # hi

    def audio_fwdbwd(s):
        def loss(p):
            with precision(cfg.compute_dtype):
                res, _ = system.audio.apply(
                    {"params": p, "batch_stats": stats["audio"]},
                    s, batch["vids"], train=True, mutable=["batch_stats"])
            return sum(jnp.sum(r.astype(jnp.float32) ** 2)
                       for r in (res[1], res[2], res[3])) \
                + jnp.sum(res[4].astype(jnp.float32) ** 2)
        g = jax.grad(loss)(params["audio"])
        return jax.tree_util.tree_leaves(g)[0]

    t = _slope(_chain(audio_fwd, spec_in))
    fl = compiled_flops(jax.jit(audio_fwd), spec_in)
    report("audio encoder fwd", t, fl)
    t = _slope(_chain(audio_fwdbwd, spec_in))
    fl = compiled_flops(jax.jit(audio_fwdbwd), spec_in)
    report("audio encoder fwd+bwd", t, fl)

    # ---- one generator cell (TCN + z + bi-GRU + MLP) ----
    dim0 = system.spec.level_dim(0)
    pre = jnp.zeros((B, cfg.n_poses, dim0 + 1), jnp.float32)
    afeat = jnp.zeros((B, cfg.n_poses, 32), jnp.float32)

    def cell_fwd(p_in):
        with precision(cfg.compute_dtype):
            out, _, _, _ = system.gens[0].apply(
                {"params": params["gens"][0]}, p_in, batch["text"], afeat,
                batch["vids"], train=False,
                rngs={"noise": rng})
        return out

    def cell_fwdbwd(p_in):
        def loss(gp):
            with precision(cfg.compute_dtype):
                out, _, _, _ = system.gens[0].apply(
                    {"params": gp}, p_in, batch["text"], afeat,
                    batch["vids"], train=True,
                    rngs={"noise": rng, "dropout": rng})
            return jnp.sum(out.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(params["gens"][0])
        return jax.tree_util.tree_leaves(g)[0]

    t = _slope(_chain(cell_fwd, pre))
    fl = compiled_flops(jax.jit(cell_fwd), pre)
    report(f"generator cell fwd (x{L} per cascade)", t, fl)
    t = _slope(_chain(cell_fwdbwd, pre))
    fl = compiled_flops(jax.jit(cell_fwdbwd), pre)
    report(f"generator cell fwd+bwd (x{L})", t, fl)

    # ---- discriminator ----
    target = batch["target"]

    def dis_fwdbwd(x):
        def loss(dp):
            with precision(cfg.compute_dtype):
                out = system.dis.apply(
                    {"params": dp, "batch_stats": stats["dis"]}, x,
                    train=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(params["dis"])
        return jax.tree_util.tree_leaves(g)[0]

    t = _slope(_chain(dis_fwdbwd, target))
    fl = compiled_flops(jax.jit(dis_fwdbwd), target)
    report("discriminator fwd+bwd", t, fl)

    # ---- standalone text encoder (contrastive branch) ----
    # tokens are ints (cannot be perturbed), so the chain perturbs params
    def text_fwdbwd(tp_seed):
        def loss(tp):
            with precision(cfg.compute_dtype):
                out = system.text.apply({"params": tp}, batch["text"],
                                        deterministic=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(tp_seed)
        return jax.tree_util.tree_leaves(g)[0]

    t = _slope(_chain(text_fwdbwd, params["text"]))
    fl = compiled_flops(jax.jit(text_fwdbwd), params["text"])
    report("text encoder fwd+bwd", t, fl)

    # ---- Adam update over the G tree ----
    import optax
    g_params = {k: params[k] for k in ("audio", "text", "gens")}
    fake_grads = jax.tree_util.tree_map(lambda x: x * 1e-8, g_params)

    def adam_step(gp):
        upd, _ = system.g_tx.update(fake_grads, state.g_opt, gp)
        return jax.tree_util.tree_leaves(optax.apply_updates(gp, upd))[0]

    t = _slope(_chain(adam_step, g_params))
    report("Adam update (G tree)", t)

    total = sum(t for _, t in rows)
    print(f"[comp {dataset} bs{B}] sum of parts (1 cell, not full "
          f"cascades): {total * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
