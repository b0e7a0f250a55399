"""GRU recurrence micro-benchmark: attribute the expressive train step's
MFU to the sequential scan and sweep the unroll factor.

The TED-Expressive flagship runs 6 levels x 4-layer bi-GRU(300) x 34 steps
per cascade, 3 cascades per train iteration (D-phase, G, diversity) plus
backward scans — the step's wall time is dominated by how fast one
34-step recurrence executes at batch 96 (VERDICT r4 item 5: attribute the
19.8% MFU).  This sweeps ops/gru.py's _UNROLL over the EXACT production
recurrence (_gru_scan incl. its custom VJP), reloading the module per
value, and prints per-scan wall time + implied matmul throughput.

Usage: python bench_gru.py [batch] [hidden] [T]
"""

import importlib
import os
import sys
import time
from functools import lru_cache

import numpy as np


def _slope_time(fn_for_n, n_lo=50, n_hi=250):
    """Slope-timed per-iteration cost: run a chained loop of n scans ended
    by a real host pull (verify skill: block_until_ready is not reliable
    over the tunnel), take the slope between two loop lengths."""
    import jax.numpy as jnp

    def run(n):
        f = fn_for_n(n)
        t0 = time.perf_counter()
        out = f()
        float(jnp.sum(out))
        return time.perf_counter() - t0

    run(n_lo)  # warm / compile
    run(n_hi)
    lo = min(run(n_lo) for _ in range(3))
    hi = min(run(n_hi) for _ in range(3))
    return (hi - lo) / (n_hi - n_lo)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 34

    import jax
    import jax.numpy as jnp
    from ha2g_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import ha2g_tpu.ops.gru as gru_mod

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(T, 2, B, 3 * H)) * 0.1, dt)
    h0 = jnp.zeros((2, B, H), dt)
    w_hh = jnp.asarray(rng.normal(size=(2, H, 3 * H)) * 0.05, dt)
    b_hh = jnp.zeros((2, 3 * H), dt)

    # per-scan recurrent matmul FLOPs: T steps of (2, B, H) @ (2, H, 3H)
    flops_scan = 2 * B * H * 3 * H * 2 * T
    print(f"[gru] B={B} H={H} T={T} bf16; recurrence "
          f"{flops_scan / 1e9:.3f} GFLOP/scan (matmul only)", flush=True)

    def harness(scan_fn):
        @lru_cache(maxsize=None)
        def fwd_for(n):
            @jax.jit
            def f():
                def body(c, _):
                    # chain iterations: a scalar from scan i feeds scan i+1
                    outs, _hf = scan_fn(xp + c, h0, w_hh, b_hh)
                    return outs[-1, 0, 0, 0].astype(dt) * 1e-6, None
                out, _ = jax.lax.scan(body, jnp.zeros((), dt), None,
                                      length=n)
                return out
            return f

        @lru_cache(maxsize=None)
        def fwdbwd_for(n):
            def loss(c):
                outs, _hf = scan_fn(xp + c, h0, w_hh, b_hh)
                return jnp.sum(outs.astype(jnp.float32))

            @jax.jit
            def f():
                def body(c, _):
                    g = jax.grad(loss)(c)
                    return (g * 1e-12).astype(dt), None
                out, _ = jax.lax.scan(body, jnp.zeros((), dt), None,
                                      length=n)
                return out
            return f

        return fwd_for, fwdbwd_for

    results = {}
    for unroll in (1, 2, 4, 8, 17, 34):
        os.environ["HA2G_GRU_UNROLL"] = str(unroll)
        mod = importlib.reload(gru_mod)
        fwd_for, fwdbwd_for = harness(mod._gru_scan)
        t_f = _slope_time(fwd_for)
        t_fb = _slope_time(fwdbwd_for)
        results[unroll] = (t_f, t_fb)
        print(f"[gru] unroll={unroll:>2}: fwd {t_f * 1e3:8.3f} ms/scan "
              f"({flops_scan / max(t_f, 1e-9) / 1e12:.2f} TFLOP/s "
              f"matmul-only), fwd+bwd {t_fb * 1e3:8.3f} ms", flush=True)

    best_f = min(results, key=lambda u: results[u][0])
    best_fb = min(results, key=lambda u: results[u][1])
    print(f"[gru] best fwd unroll={best_f}, best fwd+bwd unroll={best_fb}")


if __name__ == "__main__":
    main()
