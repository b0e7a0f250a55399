"""End-to-end hierarchy train-step test (tiny dims, CPU).

Exercises the full flagship iteration: audio encoder, contrastive losses,
3-level cascade, GAN warmup gating, diversity regularizer, KLD, physical
prior, both optimizer updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ha2g_tpu.config import Config
from ha2g_tpu.train.hierarchy import HierarchySystem

B, T, SPEC_T = 2, 34, 70
N_WORDS, N_SPK = 20, 5


def _tiny_cfg():
    return Config(model="hierarchy", dataset="ted_gesture", pose_dim=27,
                  n_poses=T, n_pre_poses=4, hidden_size=32, n_layers=2,
                  z_type="speaker", loss_warmup=10,
                  loss_gan_weight=5.0, loss_regression_weight=70.0,
                  loss_kld_weight=0.1, loss_reg_weight=0.05,
                  loss_contrastive_pos_weight=0.2,
                  loss_contrastive_neg_weight=0.005,
                  loss_physical_weight=0.01,
                  mean_dir_vec=list(np.zeros(27)))


def _batch(rng):
    return {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (B, T))),
        "spec": jnp.asarray(rng.normal(size=(B, 128, SPEC_T)).astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(B, T, 27)).astype(np.float32) * 0.1),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (B,))),
    }


@pytest.fixture(scope="module")
def system_and_state():
    cfg = _tiny_cfg()
    sys_ = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state = sys_.init(jax.random.PRNGKey(0), batch)
    return sys_, state, batch


def test_warmup_step(system_and_state):
    sys_, state, batch = system_and_state
    step = sys_.make_train_step(gan_on=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "dis" not in metrics and "gen" not in metrics
    assert {"c_pos", "c_neg", "KLD", "DIV_REG", "phy"} <= set(metrics)
    # G-side params changed, D params unchanged during warmup
    old = jax.tree_util.tree_leaves(state.params["gens"][0])[0]
    new = jax.tree_util.tree_leaves(new_state.params["gens"][0])[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    old_d = jax.tree_util.tree_leaves(state.params["dis"])[0]
    new_d = jax.tree_util.tree_leaves(new_state.params["dis"])[0]
    np.testing.assert_array_equal(np.asarray(old_d), np.asarray(new_d))


def test_gan_step(system_and_state):
    sys_, state, batch = system_and_state
    step = sys_.make_train_step(gan_on=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["dis"]))
    assert np.isfinite(float(metrics["gen"]))
    old_d = jax.tree_util.tree_leaves(state.params["dis"])[0]
    new_d = jax.tree_util.tree_leaves(new_state.params["dis"])[0]
    assert not np.allclose(np.asarray(old_d), np.asarray(new_d))


def test_eval_step(system_and_state):
    sys_, state, batch = system_and_state
    ev = sys_.make_eval_step()
    out, l1 = ev(state, batch, jax.random.PRNGKey(3))
    assert out.shape == (B, T, 27)
    assert np.isfinite(float(l1))


@pytest.mark.parametrize("z_type", ["random", "none"])
def test_z_type_variants(z_type):
    """z_type='random' draws N(0,I) (no KLD); 'none' disables z entirely
    (reference hierarchy_net.py:113-126, train_hierarchy.py:183-231)."""
    cfg = _tiny_cfg().replace(z_type=z_type)
    sys_ = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    batch = _batch(np.random.default_rng(1))
    state = sys_.init(jax.random.PRNGKey(0), batch)
    step = sys_.make_train_step(gan_on=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    if z_type == "random":
        assert "DIV_REG" in metrics and "KLD" not in metrics
    else:
        assert "DIV_REG" not in metrics and "KLD" not in metrics


@pytest.mark.parametrize("input_context", ["audio", "text"])
def test_input_context_variants(input_context):
    """input_context audio/text drops the other modality from the decoder
    input (reference hierarchy_net.py:128-137)."""
    cfg = _tiny_cfg().replace(input_context=input_context,
                              loss_contrastive_pos_weight=0.0,
                              loss_contrastive_neg_weight=0.0)
    sys_ = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    batch = _batch(np.random.default_rng(2))
    state = sys_.init(jax.random.PRNGKey(0), batch)
    _, metrics = sys_.make_train_step(gan_on=False)(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
