"""Evaluation-layer tests: Frechet distance golden values, FGD evaluator
plumbing, MAJE/accel, onset detection and beat consistency sanity."""

import numpy as np
import jax
import pytest

from ha2g_tpu.eval.fgd import EmbeddingSpaceEvaluator, frechet_distance
from ha2g_tpu.eval.metrics import (beat_consistency, maje_and_accel,
                                   onset_detect_times)
from ha2g_tpu.skeleton import TED_GESTURE


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16))
    mu, sig = x.mean(0), np.cov(x, rowvar=False)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-6


def test_frechet_distance_mean_shift():
    """For equal covariances, d^2 = |mu1 - mu2|^2."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2000, 8))
    sig = np.cov(x, rowvar=False)
    mu1 = np.zeros(8)
    mu2 = np.ones(8) * 2.0
    d = frechet_distance(mu1, sig, mu2, sig)
    np.testing.assert_allclose(d, np.sum((mu1 - mu2) ** 2), rtol=1e-5)


def test_embedding_space_evaluator_gesture():
    from ha2g_tpu.models.embedding_net import EmbeddingNet
    net = EmbeddingNet(pose_dim=27, n_frames=34, mode="pose")
    rngs = {"params": jax.random.PRNGKey(0),
            "noise": jax.random.PRNGKey(1)}
    poses = np.zeros((4, 34, 27), np.float32)
    v = net.init(rngs, None, None, None, poses)
    ev = EmbeddingSpaceEvaluator(27, 34, v["params"], v["batch_stats"])
    rng = np.random.default_rng(0)
    for _ in range(3):
        real = rng.normal(size=(4, 34, 27)).astype(np.float32)
        gen = rng.normal(size=(4, 34, 27)).astype(np.float32)
        ev.push_samples(gen, real)
    fd, feat_dist = ev.get_scores()
    div = ev.get_diversity_scores()
    assert np.isfinite(fd) and fd >= 0
    assert np.isfinite(feat_dist) and np.isfinite(div)
    # identical populations -> tiny FGD
    ev.reset()
    for _ in range(3):
        x = rng.normal(size=(4, 34, 27)).astype(np.float32)
        ev.push_samples(x, x)
    fd_same, _ = ev.get_scores()
    assert fd_same < fd


def test_maje_zero_for_identical():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 34, 27)).astype(np.float32)
    mean = np.zeros(27, np.float32)
    mae, accel = maje_and_accel(x, x, mean, TED_GESTURE)
    assert mae == 0.0 and accel == 0.0
    y = x + 0.1
    mae2, _ = maje_and_accel(y, x, mean, TED_GESTURE)
    assert mae2 > 0


def test_onset_detect_finds_clicks():
    sr = 16000
    y = np.zeros(sr * 2, np.float32)
    for t in (0.25, 0.75, 1.25, 1.75):
        i = int(t * sr)
        y[i:i + 200] = np.sin(2 * np.pi * 440 * np.arange(200) / sr)
    times = onset_detect_times(y)
    assert len(times) >= 3
    # each click should have a detected onset within 60 ms
    for t in (0.25, 0.75, 1.25):
        assert np.min(np.abs(times - t)) < 0.06


def test_beat_consistency_runs():
    from ha2g_tpu.data.synthetic import default_mean_dir_vec
    rng = np.random.default_rng(3)
    mean = default_mean_dir_vec(TED_GESTURE)
    out = rng.normal(size=(2, 34, 27)).astype(np.float32) * 0.3
    sr = 16000
    audio = np.zeros((2, int(34 / 15 * sr)), np.float32)
    for b in range(2):
        for t in (0.3, 0.9, 1.5):
            i = int(t * sr)
            audio[b, i:i + 200] = np.sin(
                2 * np.pi * 440 * np.arange(200) / sr)
    bc, n = beat_consistency(out, audio, mean, TED_GESTURE)
    assert 0.0 <= bc <= 1.0
