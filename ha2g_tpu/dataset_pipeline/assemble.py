"""Final dataset assembly (offline L0 stage 11).

Rebuild of dataset_script/script/make_ted_dataset.py: for each valid scene
of each video, gather the word list from alignment timestamps, slice the
16 kHz audio, compute the log-mel spectrogram (ops/mel.py — the reference
uses librosa with n_fft 1024 / hop 512, make_ted_dataset.py:121-123), carry
the 3D upper-body skeletons, split train/val/test 8/1/1 by clip index mod 10
(make_ted_dataset.py:130-139), and write the framework's clip storage.

Inputs are plain per-video records (produced by whatever pose-estimation
front-end you run; the reference drives OpenPose + ExPose binaries, which
are out of scope here — see PARITY.md §2.10).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

SR = 16000


def split_clips(n_clips: int) -> list[str]:
    """8/1/1 split by clip index (make_ted_dataset.py:130-139)."""
    out = []
    for i in range(n_clips):
        r = i % 10
        out.append("val" if r == 0 else "test" if r == 1 else "train")
    return out


def assemble_clips(videos: Sequence[dict], out_dir: str,
                   video_fps: float = 25.0,
                   compute_spec: bool = True) -> dict[str, int]:
    """videos: list of per-video dicts with
        vid: str
        audio: (n_samples,) float32 16 kHz
        words: [(word, start_s, end_s)] for the whole video
        scenes: [(start_frame, end_frame, skeletons_3d (F, n_joints, 3))]
    Writes <out_dir>/{train,val,test}/ clip storage; returns counts.
    """
    from ha2g_tpu.data.storage import save_clips
    from ha2g_tpu.ops.mel import log_mel_np

    splits: dict[str, list] = {"train": [], "val": [], "test": []}
    clip_idx = 0
    for video in videos:
        audio = np.asarray(video["audio"], np.float32)
        for (s_f, e_f, skel) in video["scenes"]:
            s_t, e_t = s_f / video_fps, e_f / video_fps
            a0, a1 = int(s_t * SR), int(e_t * SR)
            clip_audio = audio[a0:a1]
            if len(clip_audio) < SR:  # skip sub-second fragments
                continue
            words = [w for w in video["words"]
                     if w[1] >= s_t and w[1] <= e_t]
            spec = log_mel_np(clip_audio).astype(np.float16) \
                if compute_spec else None
            rec = {
                "vid": video["vid"],
                "skeletons_3d": np.asarray(skel, np.float32),
                "audio_raw": clip_audio,
                "audio_spec": spec,
                "words": words,
                "start_time": float(s_t), "end_time": float(e_t),
                "start_frame_no": int(s_f), "end_frame_no": int(e_f),
            }
            splits[split_clips(clip_idx + 1)[clip_idx]].append(rec)
            clip_idx += 1

    counts = {}
    for name, clips in splits.items():
        if clips:
            save_clips(Path(out_dir) / name, clips)
        counts[name] = len(clips)
    return counts
