"""Serving soak (VERDICT r4 item 7): hundreds of requests plus several
concurrent live streams against the warm service on the virtual backend,
asserting zero errors, session counts that return to zero, idle eviction
under load, and bounded RSS growth (no per-request/per-stream leak).

Documented limits (ha2g_tpu/serve.py::GestureService):
* max_batch requests coalesce per device call; clips cap at
  max_clip_seconds (longer input is truncated, surfaced in the response);
* at most max_streams live streams; a stream holds at most
  max_stream_seconds of audio; streams idle longer than
  stream_idle_timeout are evicted at the next open_stream;
* all compiled programs are fixed at startup (batch buckets) — nothing in
  the request path triggers a fresh XLA compile, which is what makes the
  RSS bound below a real leak detector rather than a compile-cache
  measurement.
"""

import threading
import time
from queue import Empty, Queue

import numpy as np
import pytest

from tests.test_serve import tiny_checkpoint  # noqa: F401 (fixture)

SR = 16000


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


@pytest.fixture(scope="module")
def soak_service(tiny_checkpoint):  # noqa: F811
    from ha2g_tpu.serve import GestureService
    svc = GestureService(tiny_checkpoint, max_clip_seconds=4.0,
                         max_batch=8, batch_window_ms=40.0,
                         low_latency=False, warm=True,
                         max_streams=8, max_stream_seconds=30.0,
                         stream_idle_timeout=300.0)
    yield svc
    svc.close()


def test_soak_requests_and_streams(soak_service):
    """240 synthesize requests from 6 workers + 6 live-stream sessions
    (3 concurrent workers x 2 sessions, ~10 s audio each fed in 0.4 s
    chunks) through one warm service.  Afterwards: no errors, every
    request answered with finite poses of the right duration, zero live
    sessions left, counters consistent, RSS growth bounded."""
    svc = soak_service
    rng = np.random.default_rng(1)
    N_REQ = 240
    errors: list = []

    rss0 = _rss_mb()
    req0 = svc.stats["requests"]

    jobs: Queue = Queue()
    for i in range(N_REQ):
        jobs.put(i)

    def request_worker():
        lrng = np.random.default_rng(threading.get_ident() % 2**31)
        while True:
            try:
                jobs.get_nowait()
            except Empty:
                return
            try:
                dur = float(lrng.uniform(0.8, 2.5))
                audio = lrng.normal(size=int(dur * SR)).astype(
                    np.float32) * 0.1
                out = svc.synthesize(audio, [("w1", 0.1, 0.4)], vid=0,
                                     fused=True, timeout=600)
                assert out.shape[0] == int(round(dur * svc.fps)), out.shape
                assert out.shape[1] == 27
                assert np.isfinite(out).all()
            except Exception as e:  # noqa: BLE001
                errors.append(f"request: {type(e).__name__}: {e}")

    def stream_worker(seed):
        lrng = np.random.default_rng(seed)
        try:
            for _session in range(2):
                audio = lrng.normal(size=10 * SR).astype(np.float32) * 0.1
                sid = svc.open_stream(vid=0, total_seconds=10.0)
                got = 0
                chunk = int(0.4 * SR)
                for off in range(0, len(audio), chunk):
                    out = svc.stream_feed(
                        sid, audio[off:off + chunk],
                        words=[("w1", off / SR, off / SR + 0.2)])
                    got += out.shape[0]
                got += svc.stream_finish(sid).shape[0]
                assert got > 0, "stream produced no frames"
        except Exception as e:  # noqa: BLE001
            errors.append(f"stream: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=request_worker) for _ in range(6)]
    threads += [threading.Thread(target=stream_worker, args=(100 + s,))
                for s in range(3)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    assert not errors, errors[:5]
    assert svc.stats["errors"] == 0
    assert svc.stats["requests"] - req0 == N_REQ
    assert svc.stats["frames"] > 0
    # micro-batching actually coalesced (fewer device calls than requests)
    assert svc.stats["batches"] < req0 + N_REQ
    # every live session closed; the registry holds no leaked entries
    with svc._streams_lock:
        assert len(svc._streams) == 0
    # bounded memory: all programs were compiled during warm-up, so
    # steady-state growth means leaked sessions/buffers.  200 MB headroom
    # covers allocator slack on this host; a real per-request leak of even
    # 1 MB would trip it at 240 requests.
    rss1 = _rss_mb()
    assert rss1 - rss0 < 200.0, (rss0, rss1)
    print(f"[soak] {N_REQ} requests + 6 stream sessions in {wall:.1f}s; "
          f"RSS {rss0:.0f} -> {rss1:.0f} MB; stats {dict(svc.stats)}")


def test_soak_idle_eviction_under_load(tiny_checkpoint):  # noqa: F811
    """Streams idle past stream_idle_timeout are evicted when capacity is
    requested, and their ids turn into clean KeyErrors — the documented
    lifecycle under sustained load."""
    from ha2g_tpu.serve import GestureService
    svc = GestureService(tiny_checkpoint, max_clip_seconds=4.0,
                         max_batch=4, batch_window_ms=20.0,
                         low_latency=False, warm=False,
                         max_streams=4, stream_idle_timeout=1.5)
    try:
        sids = [svc.open_stream(vid=0) for _ in range(4)]
        with pytest.raises(RuntimeError, match="too many live streams"):
            svc.open_stream(vid=0)
        time.sleep(1.6)
        # idle sessions evicted on demand; capacity is available again
        fresh = svc.open_stream(vid=0)
        with svc._streams_lock:
            assert fresh in svc._streams
            assert all(s not in svc._streams for s in sids)
        for s in sids:
            with pytest.raises(KeyError):
                svc.stream_feed(s, np.zeros(SR // 10, np.float32))
        svc.stream_finish(fresh)
    finally:
        svc.close()
