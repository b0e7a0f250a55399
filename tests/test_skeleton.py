"""Golden tests for SkeletonSpec kinematics and hierarchy routing.

The expected values are produced by independent numpy re-implementations of
the reference semantics (convert_dir_vec_to_pose at data_utils.py:77,
convert_pose_seq_to_dir_vec at data_utils.py:101, and the level slice /
pre-seq routing blocks at train_hierarchy.py:86-116 and
train_hierarchy_expressive.py:140-213).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ha2g_tpu.skeleton import TED_EXPRESSIVE, TED_GESTURE, skeleton_for_pose_dim


def _fk_reference(spec, vec):
    """Sequential scatter FK exactly as the reference loops do."""
    vec = vec.reshape(vec.shape[:-1] + (spec.n_bones, 3)) if vec.shape[-1] != 3 else vec
    out = np.zeros(vec.shape[:-2] + (spec.n_joints, 3))
    for b, (parent, child, length) in enumerate(spec.bones):
        out[..., child, :] = out[..., parent, :] + length * vec[..., b, :]
    return out


@pytest.mark.parametrize("spec", [TED_GESTURE, TED_EXPRESSIVE],
                         ids=lambda s: s.name)
def test_fk_matches_sequential_reference(spec):
    rng = np.random.default_rng(0)
    vec = rng.normal(size=(2, 5, spec.n_bones * 3)).astype(np.float32)
    got = np.asarray(spec.dir_vec_to_pose(jnp.asarray(vec)))
    want = _fk_reference(spec, vec)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("spec", [TED_GESTURE, TED_EXPRESSIVE],
                         ids=lambda s: s.name)
def test_ik_fk_roundtrip(spec):
    rng = np.random.default_rng(1)
    raw = rng.normal(size=(3, spec.n_bones, 3)).astype(np.float32)
    unit = raw / np.linalg.norm(raw, axis=-1, keepdims=True)
    pose = spec.dir_vec_to_pose(jnp.asarray(unit))
    back = np.asarray(spec.pose_to_dir_vec(pose))
    np.testing.assert_allclose(back, unit, atol=1e-5)


def test_gesture_level_dims():
    assert TED_GESTURE.level_dims == (15, 21, 27)
    assert TED_GESTURE.pose_dim == 27
    assert TED_GESTURE.n_joints == 10


def test_expressive_level_dims():
    assert TED_EXPRESSIVE.level_dims == (24, 30, 36, 66, 96, 126)
    assert TED_EXPRESSIVE.pose_dim == 126
    assert TED_EXPRESSIVE.n_joints == 43


def test_gesture_level_targets_match_reference_slices():
    """train_hierarchy.py:86-88: target_1 = cat(t[..., :12], t[..., 18:21]),
    target_2 = cat(t[..., :15], t[..., 18:24])."""
    rng = np.random.default_rng(2)
    t = rng.normal(size=(4, 34, 27)).astype(np.float32)
    t1 = np.asarray(TED_GESTURE.extract_level_target(jnp.asarray(t), 0))
    t2 = np.asarray(TED_GESTURE.extract_level_target(jnp.asarray(t), 1))
    np.testing.assert_array_equal(t1, np.concatenate([t[..., :12], t[..., 18:21]], -1))
    np.testing.assert_array_equal(t2, np.concatenate([t[..., :15], t[..., 18:24]], -1))
    np.testing.assert_array_equal(
        np.asarray(TED_GESTURE.extract_level_target(jnp.asarray(t), 2)), t)


def test_gesture_routing_matches_reference_fill():
    """train_hierarchy.py:108-109 and :115-116."""
    src, dst = TED_GESTURE.routing_indices(0)  # level 1 -> level 2 pre-seq
    # pre_seq_2[..., :12] = out1[..., :12]; pre_seq_2[..., 15:18] = out1[..., 12:15]
    want_src = list(range(12)) + [12, 13, 14]
    want_dst = list(range(12)) + [15, 16, 17]
    assert src.tolist() == want_src and dst.tolist() == want_dst

    src, dst = TED_GESTURE.routing_indices(1)  # level 2 -> level 3
    # pre_seq_3[..., :15] = out2[..., :15]; pre_seq_3[..., 18:24] = out2[..., 15:21]
    want_src = list(range(15)) + list(range(15, 21))
    want_dst = list(range(15)) + list(range(18, 24))
    assert src.tolist() == want_src and dst.tolist() == want_dst


def test_expressive_routing_level4_to_5_matches_reference_fill():
    """Spot-check the generic nested-bone scatter against the hand-written
    block at train_hierarchy_expressive.py:184-196 (g4 output -> pre_seq_5)."""
    src, dst = TED_EXPRESSIVE.routing_indices(3)
    fill = {}  # dst col -> src col
    for s, d in zip(src.tolist(), dst.tolist()):
        fill[d] = s
    blocks = [  # (dst_lo, dst_hi, src_lo) in units of 3 floats, from reference
        (0, 6, 0), (7, 8, 6), (9, 10, 7), (11, 12, 8), (13, 14, 9),
        (15, 18, 10), (19, 20, 13), (21, 22, 14), (23, 24, 15), (25, 26, 16),
        (27, 32, 17),  # -5*3: tail = head bones (dst dims 27..31, src 17..21)
    ]
    want = {}
    for dlo, dhi, slo in blocks:
        for i in range((dhi - dlo) * 3):
            want[dlo * 3 + i] = slo * 3 + i
    assert fill == want


def test_skeleton_for_pose_dim():
    assert skeleton_for_pose_dim(27) is TED_GESTURE
    assert skeleton_for_pose_dim(126) is TED_EXPRESSIVE


def test_expressive_extended_dir_vecs_cross_products():
    rng = np.random.default_rng(3)
    raw = rng.normal(size=(2, 3, 126)).astype(np.float32)
    ext = np.asarray(TED_EXPRESSIVE.extended_dir_vecs(jnp.asarray(raw)))
    assert ext.shape == (2, 3, 44, 3)
    v = raw.reshape(2, 3, 42, 3)
    left = np.cross(v[..., 11, :], v[..., 17, :])
    left /= np.linalg.norm(left, axis=-1, keepdims=True)
    np.testing.assert_allclose(ext[..., 42, :], left, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(ext, axis=-1),
                               np.ones((2, 3, 44)), atol=1e-5)
