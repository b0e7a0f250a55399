"""Production serving for gesture synthesis.

The reference stops at batch scripts (synthesize*.py); this module adds
the deployment surface a production user needs: a persistent process
holding the WARM compiled model (first compile is paid once, at startup),
micro-batching across concurrent requests (independent clips batch on the
leading axis — the synthesis engine's natural parallelism), and a plain
HTTP/JSON API with no extra dependencies (stdlib http.server).

  python -m ha2g_tpu.cli serve <checkpoint_dir> --port 8017

  POST /synthesize   {"audio": [..16 kHz pcm..] | base64,
                      "encoding": "pcm_f32" (default) | "pcm_i16"
                                  | "pcm_mulaw"  (G.711, 1 byte/sample),
                      "words": [["hello", 0.1, 0.4], ...],
                      "vid": 0, "fused": true,
                      "return_dtype": "f32" (default) | "f16" (half-size
                                     response body)}
      -> {"dir_vec": base64 float32|float16, "dtype": "f32"|"f16",
          "shape": [T, pose_dim], "fps": 15, "latency_ms": ...}
  GET  /healthz      -> {"ok": true, "model": ..., "pose_dim": ...}
  GET  /stats        -> request/batch counters

Live streams (synthesis.py::GestureStream — gestures generated WHILE the
audio arrives, one window behind the live edge; spectrogram-windowed
models):

  POST /stream/open          {"vid": 0, "total_seconds": null|float}
      -> {"stream_id": ...}
  POST /stream/<id>/feed     {"audio": ..., "encoding": ...,
                              "words": [...], "return_dtype": ...}
      -> {"dir_vec": ..., "shape": [n_new, pose_dim], ...}  (may be empty)
  POST /stream/<id>/finish   {"return_dtype": ...}
      -> final frames; the stream is closed

Batching model: requests arriving within `batch_window_ms` of each other
are padded to the server's fixed clip length (one compiled program — no
shape churn) and synthesized as ONE device call; each response is sliced
back to its own true duration.  Throughput therefore scales with
concurrency at near-constant latency until the batch cap.
"""

from __future__ import annotations

import base64
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue

import numpy as np

SR = 16000


@dataclass
class _Request:
    audio: np.ndarray            # (n_samples,) float32
    words: list
    vid: int
    fused: bool
    done: threading.Event = field(default_factory=threading.Event)
    result: np.ndarray | None = None
    error: str | None = None
    truncated_from: float | None = None  # original seconds, if clipped
    t_enqueue: float = field(default_factory=time.perf_counter)


@dataclass
class _WindowReq:
    inputs: dict                 # batch-1 window-step inputs
    rng: object                  # this window's jax PRNG key
    done: threading.Event = field(default_factory=threading.Event)
    result: np.ndarray | None = None
    error: str | None = None


class _WindowBatcher:
    """Coalesces ready windows from CONCURRENT live streams into one
    device call.  Window-step inputs are shape-uniform across streams
    (spec_w (128,S), text_w (T,), carry (n_pre,D), vid), so k streams'
    windows pad to the service's compiled batch buckets and run as the
    SAME program the batch path uses — k live streams cost one device
    dispatch (~34 ms tunnel round trip on this TPU) per window instead
    of k.

    Randomness caveat (same as HierarchySynthesizer.run_fused's chunking
    note): the speaker-z reparameterization eps is drawn per device call,
    so a batched window's draw differs from the solo-stream draw exactly
    as if the clips had been synthesized together; a single-request batch
    keeps the stream's own key, so an idle service stays bit-identical to
    unbatched streaming."""

    def __init__(self, synth, state, buckets, window_ms: float = 8.0,
                 stats: dict | None = None):
        self.synth = synth
        self.state = state
        self.buckets = list(buckets)
        self.window = window_ms / 1000.0
        self.stats = stats if stats is not None else {}
        self._q: Queue[_WindowReq] = Queue()
        self._stop = threading.Event()
        self._counter = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def run(self, inputs: dict, rng) -> np.ndarray:
        """GestureStream executor hook: blocks until this window ran."""
        if self._stop.is_set():
            raise RuntimeError("window batcher closed")
        req = _WindowReq(inputs=inputs, rng=rng)
        self._q.put(req)
        req.done.wait()
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        # error out anything still queued so no caller blocks forever on
        # a request the dead loop will never run
        while True:
            try:
                req = self._q.get_nowait()
            except Empty:
                break
            req.error = "window batcher closed"
            req.done.set()

    def _loop(self):
        max_b = self.buckets[-1]
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except Empty:
                continue
            reqs = [first]
            deadline = time.perf_counter() + self.window
            while len(reqs) < max_b:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    reqs.append(self._q.get(timeout=remaining))
                except Empty:
                    break
            self._run(reqs)

    def _run(self, reqs: list[_WindowReq]):
        import jax

        try:
            k = len(reqs)
            B = next(b for b in self.buckets if b >= k)
            stacked = {}
            for key in reqs[0].inputs:
                rows = [np.asarray(r.inputs[key]) for r in reqs]
                rows += [rows[-1]] * (B - k)      # pad: repeat the last row
                stacked[key] = np.concatenate(rows, axis=0)
            if k == 1:
                rng = reqs[0].rng                 # bit-equal to unbatched
            else:
                rng = jax.random.fold_in(jax.random.PRNGKey(0x57BA7C),
                                         self._counter)
            self._counter += 1
            out = np.asarray(self.synth._step(self.state, stacked, rng))
            self.stats["stream_batches"] = \
                self.stats.get("stream_batches", 0) + 1
            self.stats["stream_windows"] = \
                self.stats.get("stream_windows", 0) + k
            for i, r in enumerate(reqs):
                r.result = out[i:i + 1]
                r.done.set()
        except Exception as e:  # noqa: BLE001 — serving must not die
            for r in reqs:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()


class GestureService:
    """Checkpoint -> warm synthesizer + micro-batching loop (no HTTP)."""

    def __init__(self, checkpoint: str, max_clip_seconds: float = 20.0,
                 max_batch: int = 16, batch_window_ms: float = 30.0,
                 low_latency: bool = True, warm: bool = True,
                 max_streams: int = 32,
                 max_stream_seconds: float = 120.0,
                 stream_idle_timeout: float = 300.0,
                 stream_batching: bool = False,
                 stream_batch_window_ms: float = 8.0):
        from ha2g_tpu.cli import _load_checkpoint_system
        from ha2g_tpu.synthesis import make_synthesizer

        (self.cfg, self.lang, self.speaker, self.system,
         self.state) = _load_checkpoint_system(checkpoint)
        self.synth = make_synthesizer(self.system, self.state,
                                      low_latency=low_latency)
        self.max_clip_seconds = float(max_clip_seconds)
        self.max_batch = int(max_batch)
        self.batch_window = batch_window_ms / 1000.0
        self.n_samples = int(self.max_clip_seconds * SR)
        self.fps = self.cfg.motion_resampling_framerate
        # every device call is padded to one of these batch sizes so the
        # fleet of compiled programs is FIXED (a fresh batch size means a
        # fresh multi-second XLA compile — fatal for serving latency);
        # warmup() compiles each bucket once at startup
        self.buckets = sorted({b for b in (1, 4, 8, self.max_batch)
                               if b <= self.max_batch})
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "frames": 0, "streams_opened": 0}
        self.max_streams = int(max_streams)
        self.max_stream_seconds = float(max_stream_seconds)
        self.stream_idle_timeout = float(stream_idle_timeout)
        self._streams: dict[str, dict] = {}
        self._streams_lock = threading.Lock()
        # opt-in: coalesce concurrent streams' windows into one device call
        # (see _WindowBatcher for the randomness caveat)
        self._window_batcher = _WindowBatcher(
            self.synth, self.state, self.buckets,
            window_ms=stream_batch_window_ms, stats=self.stats) \
            if stream_batching and self._supports_streaming() else None
        self._q: Queue[_Request] = Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        if warm:
            self.warmup()

    # ------------------------------------------------------------------
    def warmup(self):
        """Compile every (bucket, path) program at startup so no request
        pays an XLA compile."""
        silent = np.zeros(self.n_samples, np.float32)
        fused_opts = (True, False) if hasattr(self.synth, "generate_fused") \
            else (False,)
        for fused in fused_opts:
            for bucket in self.buckets:
                reqs = [self.submit(silent, [], 0, fused=fused)
                        for _ in range(bucket)]
                for r in reqs:
                    r.done.wait()
        if self._supports_streaming():
            # prime the live-stream path: the B=1 window step is shared
            # with the bucket-1 program above; this compiles the bucketed
            # streaming mel front-end (synthesis.py::GestureStream)
            sid = self.open_stream(0)
            self.stream_feed(sid, np.zeros(2 * SR, np.float32))
            self.stream_feed(sid, np.zeros(2 * SR, np.float32))
            self.stream_finish(sid)

    # ---- live streams --------------------------------------------------
    def _supports_streaming(self) -> bool:
        return self.synth.uses_spec and not self.synth.uses_audio

    def open_stream(self, vid: int = 0,
                    total_seconds: float | None = None) -> str:
        """Open a live GestureStream session; returns its id.  One device
        call per ready window (B=1, the warm compiled program) — streams
        trade the batch path's throughput for bounded live latency."""
        if not self._supports_streaming():
            raise ValueError(
                f"model {self.cfg.model!r} is not spectrogram-windowed; "
                "live streaming drives spec-windowed models (hierarchy, "
                "speech2gesture)")
        import uuid
        now = time.monotonic()
        with self._streams_lock:
            for sid in [s for s, e in self._streams.items()
                        if now - e["t"] > self.stream_idle_timeout]:
                del self._streams[sid]
            if len(self._streams) >= self.max_streams:
                raise RuntimeError(
                    f"too many live streams (max {self.max_streams})")
            sid = uuid.uuid4().hex[:16]
            executor = self._window_batcher.run \
                if self._window_batcher is not None else None
            self._streams[sid] = {
                "stream": self.synth.stream(self.lang, int(vid),
                                            total_seconds=total_seconds,
                                            executor=executor),
                "lock": threading.Lock(), "t": now}
            self.stats["streams_opened"] += 1
            return sid

    def _stream_entry(self, stream_id: str) -> dict:
        with self._streams_lock:
            entry = self._streams.get(stream_id)
            if entry is None:
                raise KeyError(f"unknown stream {stream_id!r} "
                               "(finished or idle-expired)")
            entry["t"] = time.monotonic()
            return entry

    def stream_feed(self, stream_id: str, samples=None,
                    words=()) -> np.ndarray:
        """Append audio/words to a live stream; returns newly final pose
        frames (possibly 0)."""
        entry = self._stream_entry(stream_id)
        with entry["lock"]:
            st = entry["stream"]
            n_new = 0 if samples is None else len(np.atleast_1d(samples))
            if (len(st._buf) + n_new) / SR > self.max_stream_seconds:
                raise ValueError(
                    f"stream exceeds max_stream_seconds="
                    f"{self.max_stream_seconds}; finish and open a new one")
            out = st.feed(samples, words=words)
            self.stats["frames"] += int(out.shape[0])
            return out

    def stream_finish(self, stream_id: str) -> np.ndarray:
        """Flush and close a live stream; returns the final frames.
        The id is claimed (popped) BEFORE flushing so a concurrent retry
        of finish gets a clean unknown-stream error instead of racing into
        a second tail emission."""
        with self._streams_lock:
            entry = self._streams.pop(stream_id, None)
        if entry is None:
            raise KeyError(f"unknown stream {stream_id!r} "
                           "(finished or idle-expired)")
        with entry["lock"]:   # waits out any in-flight feed
            out = entry["stream"].finish()
            self.stats["frames"] += int(out.shape[0])
        return out

    # --------------------------------------------------------------------
    def submit(self, audio: np.ndarray, words, vid: int,
               fused: bool = True) -> _Request:
        audio = np.asarray(audio, np.float32).reshape(-1)
        truncated_from = None
        if audio.shape[0] > self.n_samples:
            truncated_from = audio.shape[0] / SR
            audio = audio[: self.n_samples]
        req = _Request(audio=audio, words=list(words), vid=int(vid),
                       fused=bool(fused), truncated_from=truncated_from)
        self._q.put(req)
        return req

    def synthesize(self, audio, words, vid: int = 0, fused: bool = True,
                   timeout: float = 120.0) -> np.ndarray:
        req = self.submit(audio, words, vid, fused)
        if not req.done.wait(timeout):
            raise TimeoutError("synthesis timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        if self._window_batcher is not None:
            self._window_batcher.close()

    # ------------------------------------------------------------------
    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.batch_window
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except Empty:
                    break
            # one device call per (fused-flag) group
            for fused in (True, False):
                group = [r for r in batch if r.fused == fused]
                if group:
                    self._run(group, fused)

    def _run(self, group: list[_Request], fused: bool):
        try:
            # pad to the smallest compiled bucket >= group size
            B = next(b for b in self.buckets if b >= len(group))
            audio = np.zeros((B, self.n_samples), np.float32)
            for i, r in enumerate(group):
                audio[i, : len(r.audio)] = r.audio
            words = [r.words for r in group] + \
                [[] for _ in range(B - len(group))]
            vids = np.zeros(B, np.int32)
            vids[: len(group)] = [r.vid for r in group]
            if fused and hasattr(self.synth, "generate_fused"):
                out = self.synth.generate_fused(audio, words, self.lang,
                                                vids)
            else:
                out = self.synth.generate(audio, words, self.lang, vids)
            self.stats["batches"] += 1
            for i, r in enumerate(group):
                true_frames = min(
                    out.shape[1],
                    max(1, int(round(len(r.audio) / SR * self.fps))))
                r.result = out[i, :true_frames]
                self.stats["requests"] += 1
                self.stats["frames"] += int(true_frames)
                r.done.set()
        except Exception as e:  # noqa: BLE001 — serving must not die
            self.stats["errors"] += len(group)
            for r in group:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()


# ---------------------------------------------------------------------------
# HTTP front-end
# ---------------------------------------------------------------------------

def _decode_audio(payload, encoding: str = "pcm_f32") -> np.ndarray:
    """base64 or list payload -> float32 waveform.  `encoding` names the
    wire sample format: pcm_f32 (default), pcm_i16 (half the payload), or
    pcm_mulaw (G.711 mu-law bytes, a quarter — telephony callers send
    their native format directly)."""
    from ha2g_tpu.ops.mel import pcm_to_float_np
    if isinstance(payload, str):
        raw = base64.b64decode(payload)
        if encoding == "pcm_i16":
            return pcm_to_float_np(np.frombuffer(raw, "<i2"))
        if encoding == "pcm_mulaw":
            return pcm_to_float_np(np.frombuffer(raw, np.uint8))
        return np.frombuffer(raw, "<f4").copy()
    return np.asarray(payload, np.float32)


def make_http_server(service: GestureService, host: str = "127.0.0.1",
                     port: int = 8017) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "model": service.cfg.model,
                                 "dataset": service.cfg.dataset,
                                 "pose_dim": service.cfg.pose_dim,
                                 "fps": service.fps,
                                 "max_clip_seconds":
                                 service.max_clip_seconds})
            elif self.path == "/stats":
                self._json(200, dict(service.stats))
            else:
                self._json(404, {"error": "unknown path"})

        def _encode_out(self, out: np.ndarray, rd: str) -> dict:
            if rd not in ("f32", "f16"):
                raise ValueError(f"return_dtype {rd!r}")
            arr = np.ascontiguousarray(out, "<f2" if rd == "f16" else "<f4")
            return {"dir_vec": base64.b64encode(arr.tobytes()).decode(),
                    "dtype": rd, "shape": list(arr.shape),
                    "fps": service.fps}

        def _do_stream(self, req: dict):
            """/stream/open | /stream/<id>/feed | /stream/<id>/finish."""
            if self.path == "/stream/open":
                sid = service.open_stream(
                    int(req.get("vid", 0)), req.get("total_seconds"))
                return self._json(200, {"stream_id": sid})
            parts = self.path.split("/")   # ['', 'stream', id, verb]
            if len(parts) != 4 or parts[3] not in ("feed", "finish"):
                return self._json(404, {"error": "unknown path"})
            sid, verb = parts[2], parts[3]
            t0 = time.perf_counter()
            try:
                if verb == "feed":
                    samples = None
                    if "audio" in req:
                        samples = _decode_audio(
                            req["audio"], req.get("encoding", "pcm_f32"))
                    out = service.stream_feed(sid, samples,
                                              req.get("words", ()))
                else:
                    out = service.stream_finish(sid)
            except KeyError as e:
                return self._json(404, {"error": str(e)})
            resp = self._encode_out(out, req.get("return_dtype", "f32"))
            resp["latency_ms"] = round((time.perf_counter() - t0) * 1000, 1)
            self._json(200, resp)

        def do_POST(self):
            if self.path.startswith("/stream"):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n)) if n else {}
                    return self._do_stream(req)
                except Exception as e:  # noqa: BLE001
                    return self._json(500,
                                      {"error": f"{type(e).__name__}: {e}"})
            if self.path != "/synthesize":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                audio = _decode_audio(req["audio"],
                                      req.get("encoding", "pcm_f32"))
                sent_s = len(audio) / SR
                t0 = time.perf_counter()
                out = service.synthesize(
                    audio, req.get("words", []), int(req.get("vid", 0)),
                    fused=bool(req.get("fused", True)))
                # response payload format: f32 (default) or f16 — halves
                # the response body; dir-vec components are O(0.1-1) so
                # half-precision rounding (~5e-4 relative) is negligible
                rd = req.get("return_dtype", "f32")
                if rd not in ("f32", "f16"):
                    raise ValueError(f"return_dtype {rd!r}")
                out32 = np.ascontiguousarray(
                    out, "<f2" if rd == "f16" else "<f4")
                covered = min(sent_s, service.max_clip_seconds)
                self._json(200, {
                    "dir_vec": base64.b64encode(out32.tobytes()).decode(),
                    "dtype": rd,
                    "shape": list(out32.shape), "fps": service.fps,
                    # clips beyond max_clip_seconds are covered only up to
                    # the cap — surfaced, never silent
                    "covered_seconds": round(covered, 3),
                    "truncated": sent_s > service.max_clip_seconds,
                    "latency_ms": round(
                        (time.perf_counter() - t0) * 1000, 1)})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(checkpoint: str, host: str = "127.0.0.1",
                  port: int = 8017, **kw):
    service = GestureService(checkpoint, **kw)
    httpd = make_http_server(service, host, port)
    print(f"serving {service.cfg.model}/{service.cfg.dataset} "
          f"on http://{host}:{port} (warm)")
    try:
        httpd.serve_forever()
    finally:
        service.close()
