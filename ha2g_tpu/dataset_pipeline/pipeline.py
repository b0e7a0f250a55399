"""End-to-end dataset-construction orchestrator.

The reference drives its YouTube pipeline through per-step scripts run by
hand in order (dataset_script/README.md:37-88: download_video, run_mp3,
run_openpose/run_expose, run_scenedetect, run_gentle,
run_clip_filtering, make_ted_dataset).  `build_dataset` chains the same
stages per video with the runners' artifact-level resume, so a partially
built working directory continues where it stopped, and videos whose
external tools are unavailable are skipped with a logged reason instead
of aborting the batch (the reference's RESUME_VID pattern, generalized).

Word timing source order (run_gentle.py / SubtitleWrapper semantics):
  1. a gentle alignment if the gentle package is importable,
  2. else the YouTube auto-subtitle .vtt next to the video
     (`parse_vtt` mirrors SubtitleWrapper.load_auto_subtitle_data,
     data_utils.py:377-427: per cue, words split on <c>, each word's end
     is its inline timestamp, start is the previous word's end),
  3. else no words -> the video is skipped (the reference skips
     subtitle-less videos, make_ted_dataset.py:99-101).
"""

from __future__ import annotations

import logging
import re
import wave
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ha2g_tpu.dataset_pipeline import runners
from ha2g_tpu.dataset_pipeline.assemble import assemble_clips
from ha2g_tpu.dataset_pipeline.filtering import ClipFilter, select_main_speaker

_TS = re.compile(r"(\d+)?:?(\d{2}):(\d{2})[.,](\d{3})")


def _seconds(ts: str) -> float:
    m = _TS.match(ts)
    if not m:
        raise ValueError(f"bad timestamp {ts!r}")
    h, mi, s, ms = (int(g) if g else 0 for g in m.groups())
    return h * 3600 + mi * 60 + s + ms / 1000.0


def parse_vtt(path: str | Path) -> list[tuple[str, float, float]]:
    """YouTube auto-subtitle .vtt -> [(word, start_s, end_s)].

    Mirrors the reference SubtitleWrapper.load_auto_subtitle_data
    (data_utils.py:377-427): only cue lines carrying inline <00:..>
    timestamps contribute; within such a line, text splits on <c>; each
    piece's trailing <timestamp> is that word's END, its start is the
    previous word's end (cue start for the first; the final word ends at
    the cue's end).  Plain cues without inline timestamps fall back to
    spacing the cue's words uniformly across the cue window.
    """
    words: list[tuple[str, float, float]] = []
    cue_start = cue_end = None
    for raw_line in Path(path).read_text(errors="replace").splitlines():
        line = raw_line.strip()
        if "-->" in line:
            parts = [p.strip() for p in line.split("-->")]
            cue_start = _seconds(parts[0].split()[0])
            cue_end = _seconds(parts[1].split()[0])
            continue
        if cue_start is None or not line or line.startswith(("WEBVTT",
                                                             "Kind:",
                                                             "Language:")):
            continue
        text = line.replace("</c>", "")
        text = re.sub(r"<c[.][\w.-]+>", "", text).replace("<c>", "\x00")
        if _TS.search(text):
            chunks = text.split("\x00")
            prev_end = cue_start
            for i, chunk in enumerate(chunks):
                if "<" in chunk:
                    word, ts = chunk.split("<", 1)
                    end = _seconds(ts.rstrip(">"))
                else:           # last word of the line: ends at cue end
                    word, end = chunk, cue_end
                word = word.strip()
                if word:
                    words.append((word, prev_end, end))
                prev_end = end
        else:
            # plain cue: uniform spacing (no inline word timing available)
            plain = [w for w in text.replace("\x00", " ").split() if w]
            if plain and cue_end > cue_start:
                dt = (cue_end - cue_start) / len(plain)
                for i, w in enumerate(plain):
                    words.append((w, cue_start + i * dt,
                                  cue_start + (i + 1) * dt))
    return words


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as w:
        assert w.getframerate() == 16000 and w.getnchannels() == 1, \
            f"{path}: want 16 kHz mono (extract_audio produces this)"
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return pcm.astype(np.float32) / 32768.0


def _words_for(vid: str, work: Path, audio_path: Path
               ) -> Optional[list[tuple[str, float, float]]]:
    # 1. gentle (optional dep) via the align runner's cache
    try:
        return runners.align(str(audio_path), "", str(work))
    except (runners.StepUnavailable, ImportError, OSError,
            RuntimeError) as e:
        logging.debug("gentle alignment unavailable for %s: %s", vid, e)
    # 2. auto-subtitle vtt next to the video
    for pattern in (f"*{vid}*.vtt", f"{vid}.vtt"):
        hits = sorted((work / "videos").glob(pattern))
        if hits:
            return parse_vtt(hits[0])
    return None


def process_video(vid: str, work: Path, fps: float = 25.0,
                  min_shoulder_px: float = 100.0) -> Optional[dict]:
    """Run download -> audio -> pose -> scenes -> words -> filter for one
    video; returns the per-video record assemble_clips consumes, or None
    (with the reason logged) when a required stage can't run."""
    try:
        video_path = runners.download(vid, str(work))
    except runners.StepUnavailable as e:
        logging.warning("skip %s: %s", vid, e)
        return None
    try:
        audio_path = runners.extract_audio(str(video_path), str(work))
    except runners.StepUnavailable as e:
        logging.warning("skip %s: %s", vid, e)
        return None
    try:
        kp_path = runners.pose_estimation(str(video_path), str(work))
    except runners.StepUnavailable as e:
        logging.warning("skip %s: %s", vid, e)
        return None
    try:
        scene_bounds = runners.scene_detect(str(video_path), str(work))
    except runners.StepUnavailable as e:
        logging.warning("skip %s: %s", vid, e)
        return None

    words = _words_for(vid, work, audio_path)
    if not words:
        logging.warning("skip %s: no word timings (no gentle, no .vtt)",
                        vid)
        return None

    kp = np.load(kp_path, allow_pickle=True)
    frames = list(kp["keypoints_2d"])
    skel3d = np.asarray(kp["skeletons_3d"], np.float32)

    valid_scenes = []
    n_rejected = 0
    for (s, e) in scene_bounds:
        scene = frames[s:e]
        if not scene:
            continue
        speakers = select_main_speaker(scene)
        f = ClipFilter(scene, speakers, fps=fps,
                       min_shoulder_px=min_shoulder_px)
        if f.is_correct_clip():
            valid_scenes.append((s, e, skel3d[s:e]))
        else:
            n_rejected += 1
            logging.info("%s scene [%d,%d): %s", vid, s, e, f.message)
    logging.info("%s: %d/%d scenes pass filtering", vid,
                 len(valid_scenes), len(valid_scenes) + n_rejected)
    if not valid_scenes:
        return None
    return {"vid": vid, "audio": _read_wav(audio_path), "words": words,
            "scenes": valid_scenes}


def build_dataset(video_ids: Sequence[str], work_dir: str, out_dir: str,
                  fps: float = 25.0, min_shoulder_px: float = 100.0,
                  qa_report: bool = False) -> dict:
    """Full pipeline over a list of video ids -> clip-storage splits under
    out_dir (plus an optional filtering QA html).  Returns
    {train/val/test counts, videos processed/skipped}."""
    work = Path(work_dir)
    work.mkdir(parents=True, exist_ok=True)
    videos, skipped = [], []
    for vid in video_ids:
        rec = process_video(vid, work, fps=fps,
                            min_shoulder_px=min_shoulder_px)
        if rec is None:
            skipped.append(vid)
        else:
            videos.append(rec)

    counts = assemble_clips(videos, out_dir, video_fps=fps) if videos \
        else {"train": 0, "val": 0, "test": 0}
    result = {**counts, "videos": len(videos), "skipped": skipped}

    if qa_report and videos:
        from ha2g_tpu.dataset_pipeline.report import (run_filter_pass,
                                                      write_qa_report)
        # re-run the filter pass over every video's scenes for the report
        scenes = []
        for vid in video_ids:
            kp_path = work / "keypoints" / f"{vid}.npz"
            if not kp_path.exists():
                continue
            kp = np.load(kp_path, allow_pickle=True)
            frames = list(kp["keypoints_2d"])
            for (s, e) in runners.scene_detect(
                    str(work / "videos" / f"{vid}.mp4"), str(work)):
                if frames[s:e]:
                    scenes.append(frames[s:e])
        decisions = run_filter_pass(scenes, fps=fps,
                                    min_shoulder_px=min_shoulder_px)
        out = write_qa_report(scenes, decisions,
                              Path(out_dir) / "qa_report.html")
        result["qa_report"] = str(out)
    return result
