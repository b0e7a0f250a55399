"""Dataset-construction (L0) pipeline tests: speaker selection, clip
filtering, assembly + split, end-to-end into the training pipeline."""

import numpy as np
import pytest

from ha2g_tpu.dataset_pipeline import (ClipFilter, assemble_clips,
                                       select_main_speaker, split_clips)


def _person(x0, conf=0.9, facing_front=True, shoulder=150.0):
    """Frontal upper-body keypoints around x0."""
    p = np.zeros((8, 3), np.float32)
    # nose, neck, r-shoulder, r-elbow, r-wrist, l-shoulder, l-elbow, l-wrist
    xs = [x0, x0, x0 - shoulder / 2, x0 - shoulder / 2 - 10,
          x0 - shoulder / 2 - 20, x0 + shoulder / 2, x0 + shoulder / 2 + 10,
          x0 + shoulder / 2 + 20]
    if not facing_front:
        xs[2], xs[5] = xs[5], xs[2]  # swapped shoulders = back-facing
    ys = [100, 160, 160, 220, 280, 160, 220, 280]
    p[:, 0] = xs
    p[:, 1] = ys
    p[:, 2] = conf
    return p


def test_main_speaker_tracking():
    # two people; person at x=600 has higher confidence; they drift slowly
    scene = []
    for t in range(10):
        a = _person(200 + t, conf=0.4)
        b = _person(600 + 2 * t, conf=0.9)
        scene.append(np.stack([a, b]))
    tracked = select_main_speaker(scene)
    assert all(s is not None for s in tracked)
    # follows the high-confidence speaker
    assert abs(tracked[0][0, 0] - 600) < 5
    assert abs(tracked[-1][0, 0] - 618) < 5


def test_tracking_failure_gives_none():
    a = _person(200)
    far = _person(1800)  # jumps across the frame -> tracking gate trips
    tracked = select_main_speaker([np.stack([a]), np.stack([far])])
    assert tracked[0] is not None
    assert tracked[1] is None


def test_clip_filter_pass_and_rejections():
    n = 100
    good = [np.stack([_person(500)]) for _ in range(n)]
    speakers = select_main_speaker(good)
    f = ClipFilter(good, speakers)
    assert f.is_correct_clip() and f.message == "PASS"

    short = ClipFilter(good[:10], speakers[:10])
    assert not short.is_correct_clip() and short.message == "too short"

    back = [np.stack([_person(500, facing_front=False)]) for _ in range(n)]
    fb = ClipFilter(back, select_main_speaker(back))
    assert not fb.is_correct_clip() and fb.message == "looking behind"

    small = [np.stack([_person(500, shoulder=40)]) for _ in range(n)]
    fs = ClipFilter(small, select_main_speaker(small))
    assert not fs.is_correct_clip() and fs.message == "too small"

    crowd = [np.stack([_person(100 * k) for k in range(1, 8)])
             for _ in range(n)]
    fc = ClipFilter(crowd, select_main_speaker(crowd))
    assert not fc.is_correct_clip() and fc.message == "too many people"


def test_split_ratios():
    s = split_clips(100)
    assert s.count("val") == 10 and s.count("test") == 10
    assert s.count("train") == 80


def test_assemble_to_training(tmp_path):
    """Assembly output feeds straight into the training pipeline."""
    from ha2g_tpu.data.storage import load_clips
    from ha2g_tpu.data import (Vocab, build_vocab, default_mean_dir_vec,
                               window_clips)
    from ha2g_tpu.data.synthetic import synthetic_clips
    from ha2g_tpu.skeleton import TED_GESTURE

    # fabricate per-video records from synthetic motion
    base = synthetic_clips(TED_GESTURE, n_clips=1, clip_seconds=40.0)[0]
    fps = 25.0
    n_frames = int(40.0 * fps)
    skel = np.repeat(base["skeletons_3d"], 2, axis=0)[:n_frames]
    videos = [{
        "vid": "video_a",
        "audio": np.tile(base["audio_raw"], 1)[: int(40 * 16000)],
        "words": base["words"],
        "scenes": [(0, 250, skel[0:250]), (250, 500, skel[250:500]),
                   (500, 750, skel[500:750])],
    }]
    counts = assemble_clips(videos, str(tmp_path))
    assert sum(counts.values()) == 3

    # windows build from the assembled store (train may be empty with 3
    # clips; use whichever split got one)
    split = next(k for k, v in counts.items() if v)
    clips = load_clips(tmp_path / split)
    assert clips[0]["audio_spec"] is not None
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    speaker.index_word("video_a")
    samples = window_clips(clips, TED_GESTURE, lang, speaker,
                           np.zeros(30, np.float32),
                           default_mean_dir_vec(TED_GESTURE))
    assert len(samples) > 0
    assert samples.spec.shape[1:] == (128, 70)


def test_qa_report_html(tmp_path):
    """The headless replacement for review_filtered_clips.py: filter
    decisions + overlay contact sheets rendered into one HTML file."""
    from ha2g_tpu.dataset_pipeline.report import (run_filter_pass,
                                                  write_qa_report)
    n = 100
    good = [np.stack([_person(300 + 0.2 * t)]) for t in range(n)]
    short = good[:10]
    back = []
    for t in range(n):
        p = _person(300)
        p[2, 0], p[5, 0] = p[5, 0], p[2, 0]  # swapped shoulders = back
        back.append(np.stack([p]))
    scenes = [good, short, back]
    decisions = run_filter_pass(scenes)
    assert [d["verdict"] for d in decisions] == \
        ["PASS", "too short", "looking behind"]
    out = write_qa_report(scenes, decisions, tmp_path / "qa.html")
    text = out.read_text()
    assert "PASS" in text and "looking behind" in text
    assert text.count("data:image/png;base64") >= 2  # overlays inlined
    assert "66.7%" in text or "33.3%" in text  # reason shares


def test_openpose_expose_adapter(tmp_path):
    """OpenPose JSON frame files + ExPose params -> keypoints npz contract
    (run_openpose.py:41-54, make_ted_dataset.py:162-177 semantics)."""
    import json

    from ha2g_tpu.dataset_pipeline.runners import (_EXPOSE_UPPER_BODY,
                                                   pose_estimation)

    rng = np.random.default_rng(0)
    op_dir = tmp_path / "openpose" / "vid00000001"
    op_dir.mkdir(parents=True)
    n_frames = 6
    # frame 3 empty (no people); frame 4 uses the pre-1.3 key name
    for i in range(n_frames):
        people = []
        if i != 3:
            n_people = 2 if i == 1 else 1
            for p in range(n_people):
                flat = (rng.uniform(0, 640, (25, 3)).astype(np.float32)
                        .reshape(-1).tolist())
                key = "pose_keypoints" if i == 4 else "pose_keypoints_2d"
                people.append({key: flat, "face_keypoints_2d": []})
        (op_dir / f"vid00000001_{i:012d}_keypoints.json").write_text(
            json.dumps({"version": 1.3, "people": people}))

    ex_dir = tmp_path / "expose" / "vid00000001"
    ex_dir.mkdir(parents=True)
    joints_per_frame = []
    for i in range(n_frames):
        joints = rng.normal(size=(118, 3)).astype(np.float32)
        joints_per_frame.append(joints)
        np.savez(ex_dir / f"frame_{i:012d}_params.npz", joints=joints)

    out = pose_estimation(str(tmp_path / "videos" / "vid00000001.mp4"),
                          str(tmp_path))
    data = np.load(out, allow_pickle=True)
    kp = data["keypoints_2d"]
    assert len(kp) == n_frames
    assert kp[0].shape == (1, 25, 3)
    assert kp[1].shape == (2, 25, 3)
    assert kp[3].shape == (0, 25, 3)
    assert kp[4].shape == (1, 25, 3)  # legacy key accepted
    skel = data["skeletons_3d"]
    assert skel.shape == (n_frames, 23, 3)
    np.testing.assert_allclose(
        skel[2], joints_per_frame[2][list(_EXPOSE_UPPER_BODY)])

    # the 2D frames drive main-speaker selection directly
    from ha2g_tpu.dataset_pipeline.filtering import select_main_speaker
    tracked = select_main_speaker(list(kp))
    assert tracked[0] is not None

    # resume: second call returns the existing npz without re-reading JSON
    assert pose_estimation(str(tmp_path / "videos" / "vid00000001.mp4"),
                           str(tmp_path)) == out


VTT_FIXTURE = """WEBVTT
Kind: captions
Language: en

00:00:00.000 --> 00:00:02.000 align:start position:0%

hello<00:00:00.500><c> there</c><00:00:01.100><c> friends</c>

00:00:02.000 --> 00:00:04.000
plain cue words here
"""


def test_parse_vtt_word_timing():
    """YouTube auto-sub vtt -> word list, mirroring SubtitleWrapper
    (data_utils.py:377-427): inline <ts> is each word's END, start is the
    previous word's end; plain cues space words uniformly."""
    from ha2g_tpu.dataset_pipeline.pipeline import parse_vtt

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".vtt", delete=False) as f:
        f.write(VTT_FIXTURE)
        path = f.name
    words = parse_vtt(path)
    assert words[0] == ("hello", 0.0, 0.5)
    assert words[1] == ("there", 0.5, 1.1)
    assert words[2] == ("friends", 1.1, 2.0)
    # plain cue: 4 words over [2, 4) -> 0.5 s each
    assert words[3] == ("plain", 2.0, 2.5)
    assert words[6] == ("here", 3.5, 4.0)


def _person25(x, conf=0.9):
    """BODY_25-shaped person: the existing 8-point _person padded to the
    25 rows real OpenPose output carries."""
    p = np.zeros((25, 3), np.float32)
    p[:8] = _person(x, conf=conf)
    return p


def test_build_dataset_from_artifacts(tmp_path):
    """Full orchestration over a work dir pre-populated with the artifacts
    the external tools would produce (every runner resumes from its
    output), through filtering and assembly to a loadable clip store."""
    import json
    import wave

    from ha2g_tpu.cli import cmd_build_dataset
    from ha2g_tpu.data.storage import load_clips

    work = tmp_path / "work"
    vid = "vid_test0001"
    (work / "videos").mkdir(parents=True)
    (work / "videos" / f"{vid}.mp4").write_bytes(b"\x00")  # download resume
    (work / "audio").mkdir()
    n_frames, fps = 250, 25.0
    sr, seconds = 16000, n_frames / fps
    t = np.arange(int(sr * seconds)) / sr
    pcm = (0.2 * np.sin(2 * np.pi * 220 * t) * 32767).astype("<i2")
    with wave.open(str(work / "audio" / f"{vid}.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    # keypoints: one good speaker for frames [0, 150), none after (the
    # second scene must be rejected as missing joints)
    rng = np.random.default_rng(0)
    kp = np.empty(n_frames, dtype=object)
    for i in range(n_frames):
        kp[i] = (np.stack([_person25(300 + 0.2 * i)]) if i < 150
                 else np.zeros((0, 25, 3), np.float32))
    (work / "keypoints").mkdir()
    np.savez_compressed(work / "keypoints" / f"{vid}.npz",
                        keypoints_2d=kp,
                        skeletons_3d=rng.normal(
                            size=(n_frames, 23, 3)).astype(np.float32))
    (work / "scenes").mkdir()
    (work / "scenes" / f"{vid}.csv").write_text("0,150\n150,250\n")
    # word timings via the auto-sub vtt fallback
    (work / "videos" / f"{vid}-en-auto.vtt").write_text(
        "WEBVTT\n\n00:00:00.000 --> 00:00:06.000\n"
        "hello<00:00:01.000><c> gesture</c><00:00:02.000><c> world</c>\n")

    out = tmp_path / "data"
    rc = cmd_build_dataset([vid, "--work", str(work), "--out", str(out),
                            "--qa-report"])
    assert rc == 0
    clips = []
    for split in ("train", "val", "test"):
        if (out / split).exists():
            clips += load_clips(out / split)
    assert len(clips) == 1                     # scene 2 rejected
    assert clips[0]["vid"] == vid
    assert clips[0]["skeletons_3d"].shape == (150, 23, 3)
    assert clips[0]["words"][0][0] == "hello"
    assert (out / "qa_report.html").exists()
