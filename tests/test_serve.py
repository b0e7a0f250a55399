"""Serving layer: micro-batching service + HTTP front-end
(ha2g_tpu/serve.py) driven end to end against a tiny trained-from-init
checkpoint."""

import base64
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

SR = 16000


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from ha2g_tpu.checkpoint import save_checkpoint
    from ha2g_tpu.cli import _dummy_batch
    from ha2g_tpu.config import Config
    from ha2g_tpu.data.synthetic import default_mean_dir_vec
    from ha2g_tpu.data.vocab import Vocab
    from ha2g_tpu.skeleton import TED_GESTURE
    from ha2g_tpu.train.loop import build_system

    cfg = Config(model="hierarchy", dataset="ted_gesture", pose_dim=27,
                 hidden_size=16, n_layers=2,
                 mean_dir_vec=list(map(float,
                                       default_mean_dir_vec(TED_GESTURE))))
    lang = Vocab("words")
    for i in range(8):
        lang.index_word(f"w{i}")
    lang.random_word_vectors(cfg.wordembed_dim)
    speaker = Vocab("vid", insert_default_tokens=False)
    speaker.index_word("s0")
    system = build_system(cfg, lang.n_words, max(speaker.n_words, 1),
                          lang.word_embedding_weights)
    state = system.init(jax.random.PRNGKey(0), _dummy_batch(cfg))
    out = tmp_path_factory.mktemp("ckpt") / "checkpoint"
    save_checkpoint(out, state, cfg, lang, speaker, extra={"epoch": 0})
    return str(out)


@pytest.fixture(scope="module")
def service(tiny_checkpoint):
    from ha2g_tpu.serve import GestureService
    svc = GestureService(tiny_checkpoint, max_clip_seconds=4.0,
                         max_batch=8, batch_window_ms=80.0,
                         low_latency=False, warm=False)
    yield svc
    svc.close()


def test_concurrent_requests_micro_batch(service):
    rng = np.random.default_rng(0)
    durations = [4.0, 2.5]
    results = {}

    def call(i, dur):
        audio = rng.normal(size=int(dur * SR)).astype(np.float32) * 0.1
        words = [("w1", 0.2, 0.5), ("w2", 1.0, 1.3)]
        results[i] = service.synthesize(audio, words, vid=0, fused=False,
                                        timeout=600)

    threads = [threading.Thread(target=call, args=(i, d))
               for i, d in enumerate(durations)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i, dur in enumerate(durations):
        out = results[i]
        assert out.shape[1] == 27
        # sliced back to the request's true duration
        assert out.shape[0] == int(round(dur * service.fps))
        assert np.isfinite(out).all()
    assert service.stats["requests"] >= 2
    # both landed in one device call (same fused group, within the window)
    assert service.stats["batches"] <= 2


def test_http_round_trip(service):
    from ha2g_tpu.serve import make_http_server
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["pose_dim"] == 27

        audio = (np.random.default_rng(1).normal(size=SR)
                 .astype("<f4") * 0.1)
        body = json.dumps({
            "audio": base64.b64encode(audio.tobytes()).decode(),
            "words": [["w1", 0.1, 0.3]], "vid": 0,
            "fused": False}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            resp = json.loads(r.read())
        arr = np.frombuffer(base64.b64decode(resp["dir_vec"]), "<f4")
        assert list(arr.reshape(resp["shape"]).shape) == resp["shape"]
        assert resp["shape"][0] == int(round(1.0 * service.fps))
        assert resp["shape"][1] == 27

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 3 and stats["errors"] == 0
    finally:
        httpd.shutdown()


def test_http_error_path(service):
    from ha2g_tpu.serve import make_http_server
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=b"not json",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 500
    finally:
        httpd.shutdown()


def test_service_live_stream_matches_batch(service):
    """A live stream fed chunk-by-chunk equals the one-shot host-loop
    path for the same clip (known duration, early peak — see
    synthesis.py::GestureStream)."""
    rng = np.random.default_rng(7)
    audio = rng.normal(size=3 * SR).astype(np.float32) * 0.05
    audio[4000:4600] += np.sin(np.arange(600) * 0.6).astype(np.float32)
    words = [("w1", 0.2, 0.5), ("w2", 1.1, 1.4)]
    want = service.synth.generate(
        audio[None], [words], service.lang, np.asarray([0], np.int32))[0]

    sid = service.open_stream(vid=0, total_seconds=3.0)
    outs = [service.stream_feed(sid, audio[:SR], words=words),
            service.stream_feed(sid, audio[SR:]),
            service.stream_finish(sid)]
    got = np.concatenate(outs, axis=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)
    assert service.stats["streams_opened"] >= 1
    # finished stream is gone
    with pytest.raises(KeyError):
        service.stream_feed(sid, audio[:100])


def test_service_stream_caps(service):
    sid = service.open_stream(vid=0)
    with pytest.raises(ValueError):
        service.stream_feed(
            sid, np.zeros(int(service.max_stream_seconds * SR) + SR,
                          np.float32))
    service.stream_finish(sid)


def test_http_live_stream(service):
    import urllib.error
    from ha2g_tpu.serve import make_http_server
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(path, obj, timeout=600):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    try:
        sid = post("/stream/open", {"vid": 0})["stream_id"]
        audio = (np.random.default_rng(3).normal(size=3 * SR)
                 .astype("<f4") * 0.1)
        r1 = post(f"/stream/{sid}/feed",
                  {"audio": base64.b64encode(audio.tobytes()).decode(),
                   "words": [["w1", 0.3, 0.6]]})
        r2 = post(f"/stream/{sid}/finish", {})
        from ha2g_tpu.synthesis import _window_layout
        _, _, num = _window_layout(service.cfg, 3.0)
        n = r1["shape"][0] + r2["shape"][0]
        assert r1["shape"][1] == r2["shape"][1] == 27
        assert n == 34 + (num - 1) * 30
        # unknown stream -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(f"/stream/{sid}/feed", {})
        assert ei.value.code == 404
    finally:
        httpd.shutdown()


def test_stream_batching_coalesces_windows(tiny_checkpoint):
    """With stream_batching on, concurrent live streams' windows run as
    shared device calls, and (this checkpoint has z_type='none', so the
    windows are z-noise-free) each stream's output equals its solo
    unbatched run despite the shared batch.  With z_type='speaker' the
    shared call changes the eps draw like batching the clips would — the
    documented _WindowBatcher caveat."""
    from ha2g_tpu.serve import GestureService
    svc = GestureService(tiny_checkpoint, max_clip_seconds=4.0,
                         max_batch=8, batch_window_ms=20.0,
                         low_latency=False, warm=False,
                         stream_batching=True,
                         # generous coalescing window: under full-suite
                         # load this 1-vCPU host can stagger the three
                         # feeder threads by hundreds of ms
                         stream_batch_window_ms=500.0)
    try:
        rng = np.random.default_rng(11)
        clips = [rng.normal(size=3 * SR).astype(np.float32) * 0.1
                 for _ in range(3)]

        # solo references (no batching executor)
        solo = [np.concatenate(
            [(st := svc.synth.stream(svc.lang, vid=0, total_seconds=3.0))
             .feed(c), st.finish()], axis=0) for c in clips]

        results = {}

        def run(i):
            sid = svc.open_stream(vid=0, total_seconds=3.0)
            out = [svc.stream_feed(sid, clips[i][:SR]),
                   svc.stream_feed(sid, clips[i][SR:]),
                   svc.stream_finish(sid)]
            results[i] = np.concatenate(out, axis=0)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i in range(3):
            np.testing.assert_allclose(results[i], solo[i], atol=5e-4,
                                       rtol=0, err_msg=f"stream {i}")
        # the 3 streams' windows shared device calls
        assert svc.stats["stream_windows"] >= 6
        assert svc.stats["stream_batches"] < svc.stats["stream_windows"]
    finally:
        svc.close()


def test_http_compact_encodings(service):
    """pcm_i16 and pcm_mulaw request encodings decode to (near-)identical
    waveforms, so responses match the float32 request closely."""
    from ha2g_tpu.serve import make_http_server
    from ha2g_tpu.ops.mel import mulaw_encode_np
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        wave = (np.random.default_rng(5).normal(size=SR)
                .astype("<f4") * 0.1)

        def post(audio_bytes, encoding, return_dtype="f32"):
            body = json.dumps({
                "audio": base64.b64encode(audio_bytes).decode(),
                "encoding": encoding, "return_dtype": return_dtype,
                "words": [["w1", 0.1, 0.3]], "vid": 0,
                "fused": False}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                resp = json.loads(r.read())
            assert resp["dtype"] == return_dtype
            wd = "<f2" if return_dtype == "f16" else "<f4"
            return np.frombuffer(base64.b64decode(resp["dir_vec"]),
                                 wd).reshape(resp["shape"]).astype("<f4")

        ref = post(wave.tobytes(), "pcm_f32")
        i16 = post((wave * 32768.0).astype("<i2").tobytes(), "pcm_i16")
        u8 = post(mulaw_encode_np(wave).tobytes(), "pcm_mulaw")
        f16 = post(wave.tobytes(), "pcm_f32", return_dtype="f16")
        assert ref.shape == i16.shape == u8.shape == f16.shape
        np.testing.assert_allclose(i16, ref, atol=2e-3)
        np.testing.assert_allclose(u8, ref, atol=3e-2)
        np.testing.assert_allclose(f16, ref,
                                   atol=2e-3 * max(1.0, np.abs(ref).max()))
    finally:
        httpd.shutdown()
