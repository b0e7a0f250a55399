"""Data-parallel SPMD correctness: a sharded train step over the virtual
8-device mesh must produce the same numbers as the single-device step
(replicated params, global-batch BN and loss reductions — the sync
semantics that replace the reference's DataParallel, SURVEY.md 2.9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ha2g_tpu.config import Config
from ha2g_tpu.parallel.mesh import batch_sharding, data_mesh, replicate
from ha2g_tpu.train.baselines import EmbedSystem

B, T = 16, 34


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {"target": jnp.asarray(
        rng.normal(size=(B, T, 27)).astype(np.float32) * 0.1)}


def test_mesh_has_8_devices():
    mesh = data_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device():
    cfg = Config(model="gesture_autoencoder", pose_dim=27, n_poses=T)
    sys_ = EmbedSystem(cfg)
    batch = _batch()
    state = sys_.init(jax.random.PRNGKey(0), batch)
    step = sys_.make_train_step()
    rng = jax.random.PRNGKey(1)

    # single device
    s1, m1 = step(state, batch, rng)

    # sharded over the 8-device mesh
    mesh = data_mesh()
    state_r = jax.device_put(state, replicate(mesh))
    batch_s = jax.device_put(batch, batch_sharding(mesh))
    s8, m8 = step(state_r, batch_s, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    # BN running stats are computed over the GLOBAL batch (sync-BN)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

    # gradients must match (params after an Adam step are not comparable:
    # adam's first step is sign-like, amplifying fp-epsilon grad noise)
    def loss_fn(params, batch):
        (out, _) = sys_.net.apply(
            {"params": params, "batch_stats": state.batch_stats},
            None, None, batch["target"][:, :4], batch["target"],
            train=True, mutable=["batch_stats"],
            rngs={"dropout": rng, "noise": rng})
        *_, recon = out
        return jnp.sum(jnp.mean(jnp.abs(recon - batch["target"]),
                                axis=(1, 2)))

    g1 = jax.jit(jax.grad(loss_fn))(state.params, batch)
    g8 = jax.jit(jax.grad(loss_fn))(
        jax.device_put(state.params, replicate(mesh)), batch_s)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


def test_sharded_batch_stays_sharded():
    """The train step should not silently gather the batch to one device:
    outputs/params stay replicated, inputs stay sharded."""
    cfg = Config(model="gesture_autoencoder", pose_dim=27, n_poses=T)
    sys_ = EmbedSystem(cfg)
    batch = _batch()
    state = sys_.init(jax.random.PRNGKey(0), batch)
    mesh = data_mesh()
    state = jax.device_put(state, replicate(mesh))
    batch = jax.device_put(batch, batch_sharding(mesh))
    step = sys_.make_train_step()
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8  # replicated across the mesh
