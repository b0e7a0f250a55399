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
       python bench_train.py ablate [ted_gesture|ted_expressive]
           — slope-times the step with individual loss components zeroed
             (loss weights are baked into the jitted graph as constants,
             so a zero weight removes that component's compute entirely:
             see the `> 0.0` gates in train/hierarchy.py) to attribute
             where the step time goes.
"""

import sys
import time

import numpy as np


def _timed_step(system, state, batch, step):
    import jax

    def run(n, st):
        t0 = time.perf_counter()
        metrics = None
        for k in range(n):
            st, metrics = step(st, batch, jax.random.PRNGKey(k))
        _ = float(metrics["loss"])  # real pull forces completion
        return time.perf_counter() - t0, st

    _, st = run(1, state)  # compile
    best = None
    for _ in range(2):
        t_small, _ = run(3, state)
        t_big, _ = run(13, state)
        per = (t_big - t_small) / 10
        best = per if best is None else min(best, per)
    return best


def main(dataset: str = "ted_gesture"):
    import jax
    from ha2g_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
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
    best = None
    for trial in range(3):
        t_small, _ = run(3, state)
        t_big, _ = run(13, state)
        per = (t_big - t_small) / 10
        best = per if best is None else min(best, per)
        print(f"{dataset} bs{B} trial {trial}: {per * 1000:.1f} ms/step = "
              f"{B / per:.0f} samples/s", flush=True)

    # MFU/roofline accounting (VERDICT r3 item 2)
    from ha2g_tpu.utils.roofline import compiled_flops, mfu_line
    flops = compiled_flops(step, state, batch, jax.random.PRNGKey(0))
    print(f"[mfu {dataset} bs{B}] full GAN train step: "
          f"{mfu_line(flops, best)}", flush=True)


def ablate(dataset: str = "ted_gesture"):
    """Attribute step time: re-jit the train step with one component
    removed at a time (weights are static in the graph) and report the
    delta vs the full step.  gan_off removes the D phase AND the G-side
    GAN term (the loss_warmup variant actually used for early epochs)."""
    import jax
    from ha2g_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    from __graft_entry__ import _make_system, _batch
    from ha2g_tpu.train.hierarchy import HierarchySystem

    B = 256 if dataset == "ted_gesture" else 96
    system, cfg = _make_system(dataset, hidden=300, n_layers=4)
    batch = _batch(cfg, B)
    state = system.init(jax.random.PRNGKey(0), batch)

    def variant(gan_on=True, **overrides):
        # a FRESH system per variant: overrides must also reach any
        # __init__-derived state, not just the loss weights the train step
        # reads off self.cfg (module defs are identical across variants, so
        # the shared `state` stays loadable)
        c = dataclasses.replace(cfg, **overrides)
        s = HierarchySystem(c, n_words=64, n_speakers=8)
        return s.make_train_step(gan_on=gan_on, donate=False)

    full = _timed_step(system, state, batch, variant())
    print(f"[ablate {dataset} bs{B}] full step: {full * 1000:.1f} ms "
          f"({B / full:.0f} samples/s)", flush=True)
    cases = [
        # NB: one D forward survives in this variant (the G-step D call's
        # batch-stats update feeds the new state, hierarchy.py:264-267), so
        # the delta slightly underattributes the GAN cost — it matches the
        # warmup epochs' actual step, which keeps that same forward
        ("no D phase + no GAN term (warmup variant; 1 D fwd remains)",
         dict(gan_on=False)),
        ("no diversity-reg cascade + no KLD", dict(loss_reg_weight=0.0)),
        ("no contrastive (pos+neg)",
         dict(loss_contrastive_pos_weight=0.0,
              loss_contrastive_neg_weight=0.0)),
        ("no physical prior", dict(loss_physical_weight=0.0)),
    ]
    for name, kw in cases:
        per = _timed_step(system, state, batch, variant(**kw))
        print(f"[ablate {dataset} bs{B}] {name}: {per * 1000:.1f} ms "
              f"(component ~{(full - per) * 1000:.1f} ms)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ablate":
        ablate(sys.argv[2] if len(sys.argv) > 2 else "ted_gesture")
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "ted_gesture")
