"""Benchmark: gesture-synthesis throughput per chip on the flagship model.

Runs the TED Expressive 6-level hierarchy (reference capacity: hidden 300,
4-layer bi-GRU cells, SE-ResNet audio encoder) through the sliding-window
synthesis engine on a batch of independent clips, and reports generated pose
frames per second per chip.

Baseline anchor (BASELINE.md): the reference never reports synthesis
throughput; the driver's north-star target is >=10x realtime per chip =
150 frames/s at 15 fps output.  vs_baseline = value / 150.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


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
    # upload, which dominates the call on this TPU's tunnel; the engine
    # dequantizes on device (ops/mel.py batched_log_mel_i16)
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

    # fused on-device window loop (one host round trip per batch of clips);
    # warmup compiles, then best of 3 to damp host/tunnel jitter.
    # generate_fused returns a fully materialized numpy array, so each timed
    # call includes the real device->host transfer.
    out = synth.generate_fused(audio, words, lang, vids)

    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = synth.generate_fused(audio, words, lang, vids)
        elapsed = min(elapsed, time.perf_counter() - t0)

    total_frames = out.shape[0] * out.shape[1]
    fps_per_chip = total_frames / elapsed  # single chip
    print(json.dumps({
        "metric": "expressive_hierarchy_synthesis_throughput",
        "value": round(fps_per_chip, 1),
        "unit": "pose frames/s/chip",
        "vs_baseline": round(fps_per_chip / 150.0, 2),
    }))


if __name__ == "__main__":
    main()
