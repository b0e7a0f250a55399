"""External-tool step runners for the offline dataset-construction pipeline.

The reference drives these tools from per-step scripts
(dataset_script/script/: download_video.py, run_mp3.py, run_openpose.py,
run_ffmpeg.py, run_expose.py, run_scenedetect.py, run_gentle.py); none of
the binaries (youtube-dl, ffmpeg, OpenPose, ExPose, PySceneDetect, gentle)
ship with this framework, so each runner gates on availability, supports
resume via skip-if-output-exists markers (the reference's RESUME_VID /
SKIP_EXISTING pattern, run_openpose.py:33-34), and documents the expected
output layout consumed by filtering.py / assemble.py.

Pipeline order (dataset_script/README.md:37-88):
  1. download      video + subtitles        -> <work>/videos/<vid>.mp4/.vtt
  2. extract_audio 16 kHz mono wav           -> <work>/audio/<vid>.wav
  3. pose_estimation (external; OpenPose-compatible keypoint json/npz)
                                             -> <work>/keypoints/<vid>.npz
  4. scene_detect  content-change scenes     -> <work>/scenes/<vid>.csv
  5. align         word timestamps (gentle)  -> <work>/align/<vid>.json
  6. filter+assemble (this package)          -> clip storage splits
"""

from __future__ import annotations

import csv
import json
import logging
import shutil
import subprocess
from pathlib import Path


class StepUnavailable(RuntimeError):
    pass


def _need(binary: str, hint: str) -> str:
    path = shutil.which(binary)
    if path is None:
        raise StepUnavailable(f"`{binary}` not found; {hint}")
    return path


def download(vid: str, work_dir: str, tool: str = "yt-dlp") -> Path:
    """YouTube video + auto subtitles (reference download_video.py)."""
    out = Path(work_dir) / "videos"
    out.mkdir(parents=True, exist_ok=True)
    target = out / f"{vid}.mp4"
    if target.exists():
        return target  # resume
    exe = _need(tool, "install yt-dlp/youtube-dl to fetch source videos")
    subprocess.run([exe, "-f", "mp4", "--write-auto-sub", "--sub-lang", "en",
                    "-o", str(target), f"https://youtu.be/{vid}"],
                   check=True)
    return target


def extract_audio(video_path: str, work_dir: str) -> Path:
    """ffmpeg -> 16 kHz mono wav (reference run_mp3.py:40)."""
    out = Path(work_dir) / "audio"
    out.mkdir(parents=True, exist_ok=True)
    target = out / (Path(video_path).stem + ".wav")
    if target.exists():
        return target
    exe = _need("ffmpeg", "audio extraction needs ffmpeg")
    subprocess.run([exe, "-loglevel", "panic", "-y", "-i", video_path,
                    "-ac", "1", "-ar", "16000", str(target)], check=True)
    return target


def scene_detect(video_path: str, work_dir: str,
                 threshold: float = 27.0) -> list[tuple[int, int]]:
    """PySceneDetect content detection -> (start_frame, end_frame) list
    (reference run_scenedetect.py:18-24)."""
    out = Path(work_dir) / "scenes"
    out.mkdir(parents=True, exist_ok=True)
    target = out / (Path(video_path).stem + ".csv")
    if not target.exists():
        try:
            from scenedetect import ContentDetector, SceneManager, open_video
        except ImportError as e:
            raise StepUnavailable(
                "scene detection needs the scenedetect package") from e
        video = open_video(video_path)
        mgr = SceneManager()
        mgr.add_detector(ContentDetector(threshold=threshold))
        mgr.detect_scenes(video)
        with open(target, "w", newline="") as f:
            writer = csv.writer(f)
            for s, e in mgr.get_scene_list():
                writer.writerow([s.get_frames(), e.get_frames()])
    with open(target) as f:
        return [(int(r[0]), int(r[1])) for r in csv.reader(f) if r]


def align(audio_path: str, transcript: str, work_dir: str) -> list:
    """gentle forced alignment -> [(word, start, end)]
    (reference run_gentle.py:33)."""
    out = Path(work_dir) / "align"
    out.mkdir(parents=True, exist_ok=True)
    target = out / (Path(audio_path).stem + ".json")
    if target.exists():
        return [tuple(w) for w in json.loads(target.read_text())]
    from ha2g_tpu.tts_align import gentle_align  # import-gated
    words = gentle_align(audio_path, transcript)
    target.write_text(json.dumps(words))
    return words


def pose_estimation(video_path: str, work_dir: str) -> Path:
    """Placeholder for the OpenPose/ExPose stage: the reference shells out
    to external CUDA binaries (run_openpose.py:28, run_expose.py:16).  Any
    estimator works as long as it writes <work>/keypoints/<vid>.npz with
    `keypoints_2d` (list per frame of (n_people, n_points, 3)) and
    `skeletons_3d` (F, n_joints, 3) — the layouts consumed by
    filtering.select_main_speaker and assemble.assemble_clips."""
    target = Path(work_dir) / "keypoints" / (Path(video_path).stem + ".npz")
    if target.exists():
        return target
    raise StepUnavailable(
        "pose estimation requires an external estimator (OpenPose + ExPose "
        f"in the reference); place its output at {target}")
