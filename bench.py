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
  audio host->device upload, on-device mel front-end, the fused window
  scan, and the device->host pull of the pose array.
* >= 10 timed repetitions; the reported value uses the MEDIAN (robust to
  host/tunnel jitter on this 1-vCPU host).  Spread (min/p25/p75/max) and
  a device-only timing (block_until_ready, no host pull) are printed to
  stderr for the record; stdout stays ONE JSON line.

Wire formats (round 3 profiling): the path is tunnel-bandwidth-bound —
device compute for 256 x 20 s clips is 0.24 s (scan) + 0.03 s (mel)
while the transfers at ~40 MB/s (incompressible data) cost seconds.  The
HEADLINE number therefore uses the production serving configuration:
G.711 mu-law input (1 byte/sample — the wire format telephony clients
ship natively; decoded to float on device, codec transparency verified in
tests/test_synthesis.py::test_mulaw_audio_input), float16 output pull
(upcast on host; ~5e-4 relative rounding, far below codec/model noise),
and chunked dispatch overlapping uploads with compute and pulls.  The
legacy int16-unchunked-float32 path (rounds 1-3 methodology) is also
measured and printed to stderr for round-over-round comparability.

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


def _wait_for_device(max_wait_s: float = 600.0) -> None:
    """The axon TPU tunnel occasionally drops; a bare `jax.devices()` then
    HANGS instead of failing.  Probe device init in a SUBPROCESS with a
    timeout and retry for up to max_wait_s so a transient flake at
    capture time becomes a bounded wait, and a hard outage becomes a loud
    nonzero exit instead of a silent hang."""
    import subprocess
    import time as _t

    deadline = _t.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                timeout=90, capture_output=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"[bench] device came up on attempt {attempt}",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if _t.time() > deadline:
            raise RuntimeError(
                f"TPU device init failed/hung for {max_wait_s:.0f}s "
                f"({attempt} attempts) — tunnel down?")
        print(f"[bench] device init attempt {attempt} failed; retrying",
              file=sys.stderr)
        _t.sleep(30)


def main():
    _wait_for_device()
    import jax
    from ha2g_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
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

    # the production wire format: G.711 mu-law bytes (what a telephony
    # client ships; encoded here once, outside the timed region, only
    # because the synthetic audio starts life as int16)
    from ha2g_tpu.ops.mel import mulaw_encode_np
    audio_u8 = mulaw_encode_np(audio.astype(np.float32) / 32768.0)
    # chunk sweep on this tunnel (8 reps each, same run): 32 -> 3.49 s,
    # 64 -> 3.27 s, 128 -> 2.73 s median; two 128-clip chunks overlap the
    # transfers with the least per-chunk dispatch overhead
    CHUNK = 128

    # host prep once (identical across reps); warmup compiles both paths
    plan = synth.prepare_fused(words, lang, vids, audio.shape[1])
    out = synth.run_fused(audio_u8, plan, chunk=CHUNK, out_dtype=np.float16)
    _ = synth.run_fused(audio, plan)

    e2e = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = synth.run_fused(audio_u8, plan, chunk=CHUNK,
                              out_dtype=np.float16)
        e2e.append(time.perf_counter() - t0)

    legacy = []
    for _ in range(REPS // 2):
        t0 = time.perf_counter()
        _ = synth.run_fused(audio, plan)
        legacy.append(time.perf_counter() - t0)

    # device compute only: spectrogram resident on device, no host pull —
    # isolates the fused scan from the tunnel transfers
    spec_res = _padded_spec(synth, audio, plan)
    jax.block_until_ready(spec_res)
    dev = []
    for _ in range(max(REPS // 2, 5)):
        t0 = time.perf_counter()
        r = synth._fused_step(
            synth.state, spec_res,
            plan["text_all"], plan["s0_all"], plan["vids"], plan["rng"],
            num_sub=plan["num_sub"], spec_len=plan["spec_len"])
        jax.block_until_ready(r)
        dev.append(time.perf_counter() - t0)

    total_frames = out.shape[0] * out.shape[1]
    med = statistics.median(e2e)
    fps_per_chip = total_frames / med
    qs = np.percentile(e2e, [0, 25, 50, 75, 100])
    print(f"[bench] reps={REPS} frames/call={total_frames} "
          f"(mu-law in, chunk={CHUNK}, f16 pull) e2e sec "
          f"min/p25/med/p75/max = "
          f"{qs[0]:.3f}/{qs[1]:.3f}/{qs[2]:.3f}/{qs[3]:.3f}/{qs[4]:.3f} "
          f"-> median {fps_per_chip:.0f} f/s "
          f"(best {total_frames / qs[0]:.0f}, worst {total_frames / qs[4]:.0f})",
          file=sys.stderr)
    lmed = statistics.median(legacy)
    print(f"[bench] legacy path (int16 in, unchunked, f32 pull — rounds "
          f"1-3 methodology): median {total_frames / lmed:.0f} f/s "
          f"({lmed:.3f}s, {len(legacy)} reps, "
          f"min {min(legacy):.3f} max {max(legacy):.3f})", file=sys.stderr)
    dev_med = statistics.median(dev)
    print(f"[bench] device compute only (spec resident, no pull): median "
          f"{total_frames / dev_med:.0f} f/s ({dev_med:.3f}s)",
          file=sys.stderr)

    # ---- tunnel calibration (VERDICT r4 item 8) ----
    # a fixed-size raw transfer timing, independent of the synthesis code
    # path, so round-over-round moves in the e2e number are attributable:
    # if [tunnel] MB/s moved with the headline, it was tunnel weather; if
    # [tunnel] held and the headline moved, it was a code change
    try:
        _tunnel_calibration()
    except Exception as e:  # must never cost the measured headline
        print(f"[tunnel] calibration failed (headline unaffected): {e!r}",
              file=sys.stderr)

    # ---- MFU / roofline accounting (VERDICT r3 items 2+3) ----
    from ha2g_tpu.utils.roofline import compiled_flops, mfu_line
    scan_flops = compiled_flops(
        synth._fused_step, synth.state, spec_res,
        plan["text_all"], plan["s0_all"], plan["vids"], plan["rng"],
        num_sub=plan["num_sub"], spec_len=plan["spec_len"])
    print(f"[mfu] fused synthesis scan (device-only): "
          f"{mfu_line(scan_flops, dev_med)}", file=sys.stderr)
    # transfer-vs-compute split of the e2e path: everything the e2e median
    # pays beyond on-device compute is tunnel transfer + dispatch; the
    # bytes are exact (mu-law upload + f16 pull), so the implied bandwidth
    # is the attributable roofline claim for the e2e-vs-device gap
    bytes_up = audio_u8.nbytes
    bytes_down = out.nbytes
    if med <= dev_med * 1.05:
        # degenerate on a noisy run: the e2e median landed at/below the
        # device-only median, so no transfer time is attributable
        print(f"[roofline] e2e {med:.3f}s ~= device-only {dev_med:.3f}s "
              f"on this run — transfer split not attributable (noise); "
              f"see the [tunnel] calibration line instead", file=sys.stderr)
    else:
        # NOTE: the "transfer/dispatch" bucket also contains the on-device
        # mel front-end (absent from the spec-resident device-only rep)
        # and per-chunk dispatch, so the implied bandwidth is a lower
        # bound on the raw tunnel rate; the [tunnel] line above measures
        # the raw rate directly
        xfer_s = med - dev_med
        print(f"[roofline] e2e {med:.3f}s = device {dev_med:.3f}s "
              f"({100 * dev_med / med:.0f}%) + transfer/dispatch/mel "
              f"{xfer_s:.3f}s ({100 * xfer_s / med:.0f}%); bytes/call: up "
              f"{bytes_up / 1e6:.1f} MB (mu-law) + down "
              f"{bytes_down / 1e6:.1f} MB (f16) -> implied tunnel bandwidth "
              f">= {(bytes_up + bytes_down) / xfer_s / 1e6:.1f} "
              f"MB/s; the path is transfer-bound, device compute is "
              f"{med / dev_med:.1f}x faster than the wire", file=sys.stderr)

    # auxiliary train-step reporting must never cost the already-measured
    # headline (it previously ran before the stdout JSON line; a failure
    # there discarded the capture)
    try:
        _train_step_stderr()
    except Exception as e:
        print(f"[bench] train-step reporting failed (headline unaffected): "
              f"{e!r}", file=sys.stderr)
    print(json.dumps({
        "metric": "expressive_hierarchy_synthesis_throughput",
        "value": round(fps_per_chip, 1),
        "unit": "pose frames/s/chip",
        "vs_baseline": round(fps_per_chip / 150.0, 2),
    }))


def _tunnel_calibration(mb: int = 32, reps: int = 3):
    """Raw host->device and device->host transfer rate on a fixed-size
    incompressible buffer, printed as a [tunnel] stderr line.  Gives every
    BENCH_r{N} capture a code-independent tunnel measurement so synthesis
    throughput moves can be attributed to tunnel weather vs code."""
    import jax
    import statistics as st

    buf = np.random.default_rng(7).integers(
        0, 256, mb * 1_000_000, dtype=np.uint8)
    ups, downs = [], []
    dev = None
    for _ in range(reps):
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        jax.block_until_ready(dev)
        ups.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        back = np.asarray(dev)
        downs.append(time.perf_counter() - t0)
        assert back[0] == buf[0]
    up, down = st.median(ups), st.median(downs)
    print(f"[tunnel] raw {mb} MB x{reps}: up {mb / up:.1f} MB/s "
          f"({up:.3f}s), down {mb / down:.1f} MB/s ({down:.3f}s)",
          file=sys.stderr)


def _train_step_stderr():
    """Driver-captured train-step throughput + MFU per dataset (VERDICT r3
    items 2+3): slope-timed full GAN step at the reference batch sizes,
    printed to stderr so BENCH_r{N}.tail records train perf round over
    round.  Stdout stays the single synthesis JSON line."""
    import jax
    from __graft_entry__ import _batch, _make_system
    from bench_train import _timed_step
    from ha2g_tpu.utils.roofline import compiled_flops, mfu_line

    for dataset, bs in (("ted_gesture", 256), ("ted_expressive", 96)):
        system, cfg = _make_system(dataset, hidden=300, n_layers=4)
        batch = _batch(cfg, bs)
        state = system.init(jax.random.PRNGKey(0), batch)
        step = system.make_train_step(gan_on=True, donate=False)
        per = _timed_step(system, state, batch, step)
        flops = compiled_flops(step, state, batch, jax.random.PRNGKey(0))
        print(f"[bench] train {dataset} bs{bs}: {per * 1000:.1f} ms/step = "
              f"{bs / per:.0f} samples/s | {mfu_line(flops, per)}",
              file=sys.stderr, flush=True)
        del system, state, batch, step


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
