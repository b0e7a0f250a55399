"""Train-step tests for the non-hierarchy systems (tiny dims)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from ha2g_tpu.config import Config
from ha2g_tpu.train.baselines import (EmbedSystem, MotionAESystem,
                                      MultimodalGanSystem, S2GSystem,
                                      Seq2SeqSystem)

B, T = 2, 34
N_WORDS, N_SPK = 20, 5
AUDIO_LEN = int(round(T / 15 * 16000))


def _batch(pose_dim=27, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (B, T))),
        "word_seq": jnp.asarray(rng.integers(1, N_WORDS, (B, 6))),
        "word_lengths": jnp.asarray([6, 4]),
        "spec": jnp.asarray(rng.normal(size=(B, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(B, T, pose_dim)).astype(np.float32) * 0.1),
        "audio": jnp.asarray(
            rng.normal(size=(B, AUDIO_LEN)).astype(np.float32)),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (B,))),
    }


def _check(system, state, step_fn, batch, *args):
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1), *args)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    return new_state, metrics


def test_gesture_autoencoder():
    cfg = Config(model="gesture_autoencoder", pose_dim=27, n_poses=T)
    sys_ = EmbedSystem(cfg)
    batch = _batch()
    state = sys_.init(jax.random.PRNGKey(0), batch)
    state, m = _check(sys_, state, sys_.make_train_step(), batch)
    recon, loss = sys_.make_eval_step()(state, batch, jax.random.PRNGKey(2))
    assert recon.shape == (B, T, 27)
    assert np.isfinite(float(loss))


def test_joint_embedding():
    cfg = Config(model="joint_embedding", pose_dim=27, n_poses=T,
                 hidden_size=32, n_layers=2)
    sys_ = EmbedSystem(cfg, n_words=N_WORDS)
    batch = _batch()
    state = sys_.init(jax.random.PRNGKey(0), batch)
    _check(sys_, state, sys_.make_train_step(), batch)


def test_multimodal_gan():
    cfg = Config(model="multimodal_context", pose_dim=27, n_poses=T,
                 hidden_size=32, n_layers=2, z_type="speaker",
                 loss_regression_weight=500, loss_gan_weight=5.0,
                 loss_reg_weight=0.05, loss_kld_weight=0.1)
    sys_ = MultimodalGanSystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    batch = _batch()
    state = sys_.init(jax.random.PRNGKey(0), batch)
    state, m = _check(sys_, state, sys_.make_train_step(gan_on=False), batch)
    assert "dis" not in m
    state, m = _check(sys_, state, sys_.make_train_step(gan_on=True), batch)
    assert "dis" in m and "gen" in m


def test_seq2seq():
    cfg = Config(model="seq2seq", pose_dim=27, n_poses=8, hidden_size=16,
                 n_layers=2, loss_regression_weight=250,
                 loss_kld_weight=0.1, loss_reg_weight=25)
    sys_ = Seq2SeqSystem(cfg, n_words=N_WORDS)
    batch = dict(_batch())
    batch["target"] = batch["target"][:, :8]
    state = sys_.init(jax.random.PRNGKey(0), batch)
    _check(sys_, state, sys_.make_train_step(), batch)


def test_speech2gesture():
    cfg = Config(model="speech2gesture", pose_dim=27, n_poses=T,
                 loss_regression_weight=100, loss_gan_weight=10.0)
    sys_ = S2GSystem(cfg)
    batch = _batch()
    state = sys_.init(jax.random.PRNGKey(0), batch)
    state, m = _check(sys_, state, sys_.make_train_step(), batch)
    assert {"loss", "gen", "dis"} <= set(m)


def test_motion_ae():
    cfg = Config(model="gesture_autoencoder", dataset="ted_expressive",
                 pose_dim=126, n_poses=T, latent_dim=128,
                 cos_loss_weight=50.0)
    sys_ = MotionAESystem(cfg)
    batch = _batch(pose_dim=126)
    state = sys_.init(jax.random.PRNGKey(0), batch)
    step = sys_.make_train_step()
    state, m = step(state, batch, jax.random.PRNGKey(1),
                    sys_.lr_for_epoch(0))
    assert np.isfinite(float(m["loss"]))
    assert sys_.lr_for_epoch(35) == pytest.approx(cfg.learning_rate * 0.1)
