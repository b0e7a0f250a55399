"""Skeleton video rendering.

Rebuild of the reference's matplotlib 3D animation + ffmpeg audio mux
(train_utils.py:61-146): side-by-side human vs generated skeleton animation
from direction-vector sequences.

Dependency gating for this image: matplotlib is present; the ffmpeg binary
and soundfile are not, so the renderer falls back from .mp4 (ffmpeg writer)
to .gif (pillow writer), and audio muxing is skipped with a warning when
ffmpeg is unavailable.
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import time
import wave
from pathlib import Path
from textwrap import wrap
from typing import Optional

import numpy as np

from ha2g_tpu.skeleton import SkeletonSpec


def _write_wav(path: str, audio: np.ndarray, sr: int = 16000) -> None:
    """Minimal 16-bit PCM writer (soundfile is not bundled)."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def create_video_and_save(save_path: str, epoch: int, prefix: str,
                          iter_idx, target: Optional[np.ndarray],
                          output: np.ndarray, mean_data: np.ndarray,
                          title: str, spec: SkeletonSpec,
                          audio: Optional[np.ndarray] = None,
                          aux_str: Optional[str] = None, fps: int = 15,
                          delete_audio_file: bool = True) -> str:
    """Render (T, pose_dim) mean-subtracted dir-vec sequences to video.

    Returns the written file path (.mp4 with ffmpeg available, else .gif).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    t0 = time.time()
    Path(save_path).mkdir(parents=True, exist_ok=True)

    fig = plt.figure(figsize=(8, 4))
    axes = [fig.add_subplot(1, 2, 1, projection="3d"),
            fig.add_subplot(1, 2, 2, projection="3d")]
    for ax in axes:
        ax.view_init(elev=20, azim=-60)
    fig_title = title + ("\n" + aux_str if aux_str else "")
    fig.suptitle("\n".join(wrap(fig_title, 75)), fontsize="medium")

    mean = np.asarray(mean_data).flatten()
    out_pos = np.asarray(spec.dir_vec_to_pose(output + mean))
    tgt_pos = np.asarray(spec.dir_vec_to_pose(target + mean)) \
        if target is not None else None

    pairs = [(p, c) for p, c, _ in spec.bones]

    def animate(i):
        for k, (name, poses) in enumerate(
                [("human", tgt_pos), ("generated", out_pos)]):
            if poses is None or i >= len(poses):
                continue
            pose = poses[i]
            axes[k].clear()
            for (a, b) in pairs:
                axes[k].plot([pose[a, 0], pose[b, 0]],
                             [pose[a, 2], pose[b, 2]],
                             [pose[a, 1], pose[b, 1]],
                             zdir="z", linewidth=1.5)
            axes[k].set_xlim3d(-0.5, 0.5)
            axes[k].set_ylim3d(0.5, -0.5)
            axes[k].set_zlim3d(0.5, -0.5)
            axes[k].set_title(f"{name} ({i + 1}/{len(out_pos)})")

    n_frames = max(len(out_pos), len(tgt_pos) if tgt_pos is not None else 0)
    ani = animation.FuncAnimation(fig, animate, interval=1000 // fps,
                                  frames=n_frames, repeat=False)

    have_ffmpeg = shutil.which("ffmpeg") is not None
    stem = f"{save_path}/{prefix}_{epoch:03d}_{iter_idx}"
    if have_ffmpeg:
        video_path = stem + ("_temp.mp4" if audio is not None else ".mp4")
        ani.save(video_path, fps=fps, dpi=80, writer="ffmpeg")
    else:
        video_path = stem + ".gif"
        ani.save(video_path, fps=fps, dpi=60, writer="pillow")
    plt.close(fig)

    if audio is not None and have_ffmpeg:
        audio_path = stem + ".wav"
        _write_wav(audio_path, np.asarray(audio, np.float32))
        merged = stem + ".mp4"
        subprocess.call(["ffmpeg", "-loglevel", "panic", "-y", "-i",
                         video_path, "-i", audio_path, "-strict", "-2",
                         merged])
        if delete_audio_file:
            os.remove(audio_path)
        os.remove(video_path)
        video_path = merged
    elif audio is not None:
        logging.warning("ffmpeg unavailable: skipping audio mux; wrote %s",
                        video_path)

    logging.info("rendered %s in %.1fs", video_path, time.time() - t0)
    return video_path
