"""Native window engine: build, and numerical equivalence with the numpy
reference path in ha2g_tpu/data/dataset.py."""

import math

import numpy as np
import pytest

from ha2g_tpu import native
from ha2g_tpu.data.dataset import (MotionFilter, _pose_to_dir_vec_np,
                                   resample_pose_seq)
from ha2g_tpu.data.synthetic import default_mean_dir_vec, synthetic_clips
from ha2g_tpu.skeleton import TED_GESTURE

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _numpy_reference(skel, duration, fps, spec, mdv, mp, n_poses, n_ext,
                     stride, static_joints):
    rs = resample_pose_seq(skel.reshape(len(skel), -1), duration, fps)
    rs = rs.reshape(len(rs), spec.n_joints, 3)
    mfilter = MotionFilter(mp, static_joints)
    targets, starts = [], []
    num_sub = math.floor((len(rs) - n_ext) / stride) + 1
    for i in range(num_sub):
        win = rs[i * stride: i * stride + n_ext]
        if mfilter.check(win) != "PASS":
            continue
        dvec = _pose_to_dir_vec_np(win[:n_poses], spec)
        targets.append(dvec.reshape(n_poses, -1) - mdv.reshape(1, -1))
        starts.append(i * stride)
    return (np.stack(targets) if targets else
            np.zeros((0, n_poses, spec.pose_dim), np.float32)), starts


def test_native_matches_numpy():
    spec = TED_GESTURE
    clips = synthetic_clips(spec, n_clips=3, clip_seconds=8.0, seed=5)
    mdv = default_mean_dir_vec(spec)
    mp = np.zeros(spec.n_joints * 3, np.float32)
    for clip in clips:
        skel = clip["skeletons_3d"]
        dur = clip["end_time"] - clip["start_time"]
        t_nat, p_nat, s_nat = native.window_clip_native(
            skel, dur, 15, spec, mdv, mp, 34, 42, 10)
        t_np, s_np = _numpy_reference(skel, dur, 15, spec, mdv, mp,
                                      34, 42, 10, (6, 9))
        assert list(s_nat) == s_np
        np.testing.assert_allclose(t_nat, t_np, atol=2e-5)


def test_native_filter_rejects_static():
    spec = TED_GESTURE
    mdv = default_mean_dir_vec(spec)
    mp = np.zeros(spec.n_joints * 3, np.float32)
    # perfectly static skeleton with upright spine and non-mean pose:
    # rejected by the static-motion check
    pose = np.asarray(spec.dir_vec_to_pose(
        mdv.reshape(spec.n_bones, 3)))
    skel = np.tile(pose[None], (120, 1, 1)).astype(np.float32)
    t, p, s = native.window_clip_native(skel, 8.0, 15, spec, mdv, mp,
                                        34, 42, 10)
    assert len(t) == 0
    t2, _, _ = native.window_clip_native(skel, 8.0, 15, spec, mdv, mp,
                                         34, 42, 10,
                                         disable_filtering=True)
    assert len(t2) > 0


def test_window_clips_native_equals_numpy():
    """Pipeline-level equality: window_clips with and without the C++
    engine must emit identical samples."""
    from ha2g_tpu.data import Vocab, build_vocab, window_clips
    spec = TED_GESTURE
    clips = synthetic_clips(spec, n_clips=3, clip_seconds=8.0, seed=7)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    mdv = default_mean_dir_vec(spec)
    mp = np.zeros(spec.n_joints * 3, np.float32)
    kw = dict(spec=spec, lang=lang, speaker=speaker, mean_pose=mp,
              mean_dir_vec=mdv)
    a = window_clips(clips, use_native=True, **kw)
    b = window_clips(clips, use_native=False, **kw)
    assert len(a) == len(b)
    np.testing.assert_allclose(a.target, b.target, atol=2e-5)
    np.testing.assert_array_equal(a.text, b.text)
    np.testing.assert_array_equal(a.word_seq, b.word_seq)
    np.testing.assert_allclose(a.audio, b.audio)
    np.testing.assert_allclose(a.spec, b.spec)
