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


def test_expressive_level_targets_match_reference_slices():
    """All six expressive level targets vs the literal cat-of-slices at
    train_hierarchy_expressive.py:140-145."""
    rng = np.random.default_rng(7)
    t = rng.normal(size=(2, 34, 126)).astype(np.float32)
    cat = lambda *parts: np.concatenate(parts, -1)
    want = [
        cat(t[..., :3 * 3], t[..., -5 * 3:]),
        cat(t[..., :4 * 3], t[..., 20 * 3:21 * 3], t[..., -5 * 3:]),
        cat(t[..., :5 * 3], t[..., 20 * 3:22 * 3], t[..., -5 * 3:]),
        cat(t[..., :6 * 3], t[..., 8 * 3:9 * 3], t[..., 11 * 3:12 * 3],
            t[..., 14 * 3:15 * 3], t[..., 17 * 3:18 * 3],
            t[..., 20 * 3:23 * 3], t[..., 25 * 3:26 * 3],
            t[..., 28 * 3:29 * 3], t[..., 31 * 3:32 * 3],
            t[..., 34 * 3:35 * 3], t[..., -5 * 3:]),
        cat(t[..., :7 * 3], t[..., 8 * 3:10 * 3], t[..., 11 * 3:13 * 3],
            t[..., 14 * 3:16 * 3], t[..., 17 * 3:19 * 3],
            t[..., 20 * 3:24 * 3], t[..., 25 * 3:27 * 3],
            t[..., 28 * 3:30 * 3], t[..., 31 * 3:33 * 3],
            t[..., 34 * 3:36 * 3], t[..., -5 * 3:]),
        t,
    ]
    for level, w in enumerate(want):
        got = np.asarray(
            TED_EXPRESSIVE.extract_level_target(jnp.asarray(t), level))
        np.testing.assert_array_equal(got, w, err_msg=f"level {level}")


# The reference's literal pre-seq fill blocks (dst_slice, src_slice), one
# list per level transition g_k out -> pre_seq_{k+1}, transcribed from
# train_hierarchy_expressive.py:260-309 (identical blocks at :155-213 and
# :336-393, and in synthesize_expressive_hierarchy.py:140-187).  Note the
# `-5*3:` head blocks are NEGATIVE slices — on the real (dim+1)-wide
# pre-seq buffer they land one column late (see SkeletonSpec.
# ref_routing_compat).  Shared with tests/test_train_parity.py.
_s = slice
EXPRESSIVE_REF_FILLS = [
    # g1 out (24) -> pre_seq_2 (27): :260-261
    [(_s(0, 3 * 3), _s(0, 3 * 3)), (_s(-5 * 3, None), _s(-5 * 3, None))],
    # g2 out (27) -> pre_seq_3 (33): :267-269
    [(_s(0, 4 * 3), _s(0, 4 * 3)), (_s(5 * 3, 6 * 3), _s(4 * 3, 5 * 3)),
     (_s(-5 * 3, None), _s(-5 * 3, None))],
    # g3 out (33) -> pre_seq_4 (66): :275-277
    [(_s(0, 5 * 3), _s(0, 5 * 3)), (_s(10 * 3, 12 * 3), _s(5 * 3, 7 * 3)),
     (_s(-5 * 3, None), _s(-5 * 3, None))],
    # g4 out (66) -> pre_seq_5 (96): :283-293
    [(_s(0, 6 * 3), _s(0, 6 * 3)), (_s(7 * 3, 8 * 3), _s(6 * 3, 7 * 3)),
     (_s(9 * 3, 10 * 3), _s(7 * 3, 8 * 3)),
     (_s(11 * 3, 12 * 3), _s(8 * 3, 9 * 3)),
     (_s(13 * 3, 14 * 3), _s(9 * 3, 10 * 3)),
     (_s(15 * 3, 18 * 3), _s(10 * 3, 13 * 3)),
     (_s(19 * 3, 20 * 3), _s(13 * 3, 14 * 3)),
     (_s(21 * 3, 22 * 3), _s(14 * 3, 15 * 3)),
     (_s(23 * 3, 24 * 3), _s(15 * 3, 16 * 3)),
     (_s(25 * 3, 26 * 3), _s(16 * 3, 17 * 3)),
     (_s(-5 * 3, None), _s(-5 * 3, None))],
    # g5 out (96) -> pre_seq_6 (126): :299-309
    [(_s(0, 7 * 3), _s(0, 7 * 3)), (_s(8 * 3, 10 * 3), _s(7 * 3, 9 * 3)),
     (_s(11 * 3, 13 * 3), _s(9 * 3, 11 * 3)),
     (_s(14 * 3, 16 * 3), _s(11 * 3, 13 * 3)),
     (_s(17 * 3, 19 * 3), _s(13 * 3, 15 * 3)),
     (_s(20 * 3, 24 * 3), _s(15 * 3, 19 * 3)),
     (_s(25 * 3, 27 * 3), _s(19 * 3, 21 * 3)),
     (_s(28 * 3, 30 * 3), _s(21 * 3, 23 * 3)),
     (_s(31 * 3, 33 * 3), _s(23 * 3, 25 * 3)),
     (_s(34 * 3, 36 * 3), _s(25 * 3, 27 * 3)),
     (_s(-5 * 3, None), _s(-5 * 3, None))],
]


def _apply_routing(spec, level, out):
    """Scatter level `level`'s output into a zeroed level-(level+1) buffer
    via our generic routing tables."""
    dst = np.zeros(out.shape[:-1] + (spec.level_dim(level + 1),), out.dtype)
    src_cols, dst_cols = spec.routing_indices(level)
    dst[..., dst_cols] = out[..., src_cols]
    return dst


def test_expressive_routing_all_levels_match_reference_fill():
    """Every pre-seq fill block of the 6-level cascade, applied to real
    arrays: the reference's hand-written slice assignments at
    train_hierarchy_expressive.py:260-309 (levels k -> k+1 for k = 1..5,
    1-based), on two buffer widths:

    * width D (the slices' evident INTENT — each bone to its own columns):
      must equal the default clean routing tables;
    * width D+1 (the ACTUAL pre-seq buffer, whose extra constraint-bit
      column makes the `-5*3:` head blocks land one column late): must
      equal the ref_routing_compat variant's tables.
    """
    from ha2g_tpu.skeleton import REF_COMPAT_SKELETONS

    rng = np.random.default_rng(8)
    spec = TED_EXPRESSIVE
    compat = REF_COMPAT_SKELETONS["ted_expressive"]
    assert compat.ref_routing_compat and compat.ref_tail_fill_bones == 5
    outs = [rng.normal(size=(2, 5, spec.level_dim(k))).astype(np.float32)
            for k in range(5)]

    def ref_fill(width, blocks, out):
        buf = np.zeros(out.shape[:-1] + (width,), out.dtype)
        for dst_sl, src_sl in blocks:
            buf[..., dst_sl] = out[..., src_sl]
        return buf

    ref_blocks = EXPRESSIVE_REF_FILLS
    for k in range(5):
        D = spec.level_dim(k + 1)
        # intent (width D) == clean routing
        want = ref_fill(D, ref_blocks[k], outs[k])
        got = _apply_routing(spec, k, outs[k])
        np.testing.assert_array_equal(got, want, err_msg=f"level {k}->{k+1}")
        # actual reference layout (width D+1) == compat routing
        want = ref_fill(D + 1, ref_blocks[k], outs[k])
        buf = np.zeros(outs[k].shape[:-1] + (D + 1,), outs[k].dtype)
        src_cols, dst_cols = compat.routing_indices(k)
        buf[..., dst_cols] = outs[k][..., src_cols]
        np.testing.assert_array_equal(
            buf, want, err_msg=f"compat level {k}->{k+1}")
        # the quirk is real: head components shifted, bit column clobbered
        assert want[..., D].any() and not want[..., D - 15].any()


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
