"""Live gesture streaming over HTTP — minimal client (stdlib only).

Feeds a wav file to a running `python -m ha2g_tpu.cli serve <ckpt>` server
in simulated real time (chunked at --chunk-ms cadence) through a
/stream/* session, and prints how far the generated gestures trail the
audio edge.  The engine is causal, so frames arrive one window (~2.27 s)
behind live audio — suitable for driving an avatar while a speaker talks.

    python examples/live_stream_client.py speech.wav --port 8017 \
        --words "hello,0.2,0.5 world,0.7,1.1" --vid 0
"""

import argparse
import base64
import json
import time
import urllib.request
import wave

import numpy as np


def post(url: str, obj: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("wav", help="16 kHz mono wav")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8017)
    p.add_argument("--vid", type=int, default=0)
    p.add_argument("--chunk-ms", type=float, default=500.0)
    p.add_argument("--words", default="",
                   help="space-separated word,start,end triples (feed them "
                        "ahead of the audio; empty = no transcript)")
    p.add_argument("--out", default="stream_poses.npz")
    p.add_argument("--realtime", action="store_true",
                   help="sleep to real audio cadence between chunks")
    a = p.parse_args()

    with wave.open(a.wav, "rb") as w:
        assert w.getframerate() == 16000 and w.getnchannels() == 1, \
            "expects 16 kHz mono"
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    total_s = len(pcm) / 16000.0
    words = [[t.split(",")[0], float(t.split(",")[1]), float(t.split(",")[2])]
             for t in a.words.split() if t]

    base = f"http://{a.host}:{a.port}"
    sid = post(f"{base}/stream/open",
               {"vid": a.vid, "total_seconds": total_s})["stream_id"]
    if words:   # transcript known up front (TTS case): feed it first
        post(f"{base}/stream/{sid}/feed", {"words": words})

    chunk = int(a.chunk_ms / 1000.0 * 16000)
    frames, t0 = [], time.perf_counter()
    for i in range(0, len(pcm), chunk):
        piece = pcm[i:i + chunk]
        r = post(f"{base}/stream/{sid}/feed", {
            "audio": base64.b64encode(piece.tobytes()).decode(),
            "encoding": "pcm_i16"})
        if r["shape"][0]:
            arr = np.frombuffer(base64.b64decode(r["dir_vec"]),
                                "<f4").reshape(r["shape"])
            frames.append(arr)
            audio_t = (i + len(piece)) / 16000.0
            pose_t = sum(f.shape[0] for f in frames) / r["fps"]
            print(f"audio@{audio_t:6.2f}s  gestures@{pose_t:6.2f}s  "
                  f"(lag {audio_t - pose_t:4.2f}s, +{r['shape'][0]} frames, "
                  f"{r['latency_ms']:.0f} ms server)")
        if a.realtime:
            time.sleep(max(0.0, (i + chunk) / 16000.0 -
                           (time.perf_counter() - t0)))
    r = post(f"{base}/stream/{sid}/finish", {})
    if r["shape"][0]:
        frames.append(np.frombuffer(base64.b64decode(r["dir_vec"]),
                                    "<f4").reshape(r["shape"]))
    poses = np.concatenate(frames, axis=0)
    np.savez(a.out, dir_vec=poses, fps=r["fps"])
    print(f"wrote {a.out}: {poses.shape} "
          f"({poses.shape[0] / r['fps']:.1f}s of gesture)")


if __name__ == "__main__":
    main()
