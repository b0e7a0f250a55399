"""Train-step microbenchmark for the flagship hierarchy systems.

Slope-timed (the repo's standard methodology — a loop of N jitted steps
ended by ONE real device->host pull; slope between two loop lengths
isolates per-step device time from dispatch/pull overhead, since this
TPU's tunnel makes block_until_ready unreliable for timing).

Measures the full GAN iteration (D update + G update with contrastive,
cascade, diversity regularizer, KLD, physical prior) — the same work as
the reference's samples/s log lines (BASELINE.md: 212-216 samples/s on
4x V100 for TED Gesture bs 256; 112-114 on 2x V100 for TED Expressive
bs 96).

Usage: python bench_train.py [ted_gesture|ted_expressive]
"""

import sys
import time

import numpy as np


def main(dataset: str = "ted_gesture"):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ha2g_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from __graft_entry__ import _make_system, _batch

    B = 256 if dataset == "ted_gesture" else 96
    system, cfg = _make_system(dataset, hidden=300, n_layers=4)
    batch = _batch(cfg, B)
    state = system.init(jax.random.PRNGKey(0), batch)
    step = system.make_train_step(gan_on=True, donate=False)

    def run(n, st):
        t0 = time.perf_counter()
        metrics = None
        for k in range(n):
            st, metrics = step(st, batch, jax.random.PRNGKey(k))
        _ = float(metrics["loss"])  # real pull forces completion
        return time.perf_counter() - t0, st

    _, st = run(1, state)  # compile
    for trial in range(3):
        t_small, _ = run(3, state)
        t_big, _ = run(13, state)
        per = (t_big - t_small) / 10
        print(f"{dataset} bs{B} trial {trial}: {per * 1000:.1f} ms/step = "
              f"{B / per:.0f} samples/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ted_gesture")
