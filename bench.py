"""Benchmark: gesture-synthesis throughput per chip on the flagship model.

Runs the TED Expressive 6-level hierarchy (reference capacity: hidden 300,
4-layer bi-GRU cells, SE-ResNet audio encoder) through the fused sliding-
window synthesis engine on a batch of independent clips, and reports
generated pose frames per second per chip.

Measurement protocol (round 3 — VERDICT item 1):
* Host-side input prep (window layout + word-index tensors) is hoisted out
  of the timed region via `HierarchySynthesizer.prepare_fused`; it is
  identical across repetitions and a real deployment builds it once per
  script.
* The timed region covers the full request path a serving caller pays:
  int16 PCM host->device upload, on-device mel front-end, the fused
  window scan, and the device->host pull of the pose array.
* >= 10 timed repetitions; the reported value uses the MEDIAN (robust to
  host/tunnel jitter on this 1-vCPU host).  Spread (min/p25/p75/max) and
  a device-only timing (block_until_ready, no host pull) are printed to
  stderr for the record; stdout stays ONE JSON line.

Baseline anchor (BASELINE.md): the reference never reports synthesis
throughput; the driver's north-star target is >=10x realtime per chip =
150 frames/s at 15 fps output.  vs_baseline = value / 150.
"""

import json
import statistics
import sys
import time

import numpy as np

REPS = 12


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ha2g_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from __graft_entry__ import _make_system
    from ha2g_tpu.data.vocab import Vocab
    from ha2g_tpu.synthesis import HierarchySynthesizer

    n_words, n_speakers = 64, 8
    system, cfg = _make_system("ted_expressive", hidden=300, n_layers=4,
                               n_words=n_words, n_speakers=n_speakers)

    # vocab for the text front-end
    lang = Vocab("words")
    for i in range(n_words - lang.n_words):
        lang.index_word(f"w{i}")

    rng = np.random.default_rng(0)
    B = 256                      # independent clips synthesized together
    clip_seconds = 20.0
    sr = 16000
    # int16 PCM, the native wav sample format: halves the host->device
    # upload; the engine dequantizes on device (ops/mel.py
    # batched_log_mel_i16)
    audio = (rng.normal(size=(B, int(clip_seconds * sr))) * 0.1
             * 32767).clip(-32768, 32767).astype(np.int16)
    words = [[(f"w{rng.integers(0, 40)}", float(t), float(t + 0.3))
              for t in np.arange(0.3, clip_seconds - 0.5, 0.45)]
             for _ in range(B)]
    vids = rng.integers(0, n_speakers, (B,)).astype(np.int32)

    # init flagship params
    from __graft_entry__ import _batch
    state = system.init(jax.random.PRNGKey(0), _batch(cfg, 2))
    synth = HierarchySynthesizer(system, state)

    # host prep once (identical across reps); warmup compiles
    plan = synth.prepare_fused(words, lang, vids, audio.shape[1])
    out = synth.run_fused(audio, plan)

    e2e = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = synth.run_fused(audio, plan)
        e2e.append(time.perf_counter() - t0)

    # device-only: upload happens, result stays on device (no host pull)
    dev = []
    for _ in range(max(REPS // 2, 5)):
        t0 = time.perf_counter()
        r = synth._fused_step(
            synth.state, _padded_spec(synth, audio, plan),
            plan["text_all"], plan["s0_all"], plan["vids"], plan["rng"],
            num_sub=plan["num_sub"], spec_len=plan["spec_len"])
        jax.block_until_ready(r)
        dev.append(time.perf_counter() - t0)

    total_frames = out.shape[0] * out.shape[1]
    med = statistics.median(e2e)
    fps_per_chip = total_frames / med
    qs = np.percentile(e2e, [0, 25, 50, 75, 100])
    print(f"[bench] reps={REPS} frames/call={total_frames} "
          f"e2e sec min/p25/med/p75/max = "
          f"{qs[0]:.3f}/{qs[1]:.3f}/{qs[2]:.3f}/{qs[3]:.3f}/{qs[4]:.3f} "
          f"-> median {fps_per_chip:.0f} f/s "
          f"(best {total_frames / qs[0]:.0f}, worst {total_frames / qs[4]:.0f})",
          file=sys.stderr)
    print(f"[bench] device-only (no host pull): median "
          f"{total_frames / statistics.median(dev):.0f} f/s "
          f"({statistics.median(dev):.3f}s)", file=sys.stderr)
    print(json.dumps({
        "metric": "expressive_hierarchy_synthesis_throughput",
        "value": round(fps_per_chip, 1),
        "unit": "pose frames/s/chip",
        "vs_baseline": round(fps_per_chip / 150.0, 2),
    }))


def _padded_spec(synth, audio, plan):
    import jax.numpy as jnp
    from ha2g_tpu.synthesis import _mel_any
    full_spec = _mel_any(audio)
    if plan["pad_to"] > plan["S_total"]:
        full_spec = jnp.pad(
            full_spec, ((0, 0), (0, 0),
                        (0, plan["pad_to"] - plan["S_total"])), mode="edge")
    return full_spec


if __name__ == "__main__":
    main()
