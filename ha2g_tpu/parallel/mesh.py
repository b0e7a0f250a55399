"""Device mesh + sharding helpers.

The reference's only parallelism is single-host torch DataParallel
(train.py:132-143).  The TPU-native replacement is SPMD: a 1-D 'data' mesh
over ICI, batch-dim-sharded inputs, replicated parameters, and XLA-inserted
collectives for the gradient all-reduce (implicit in jit over the mesh).
The mesh abstraction leaves room for model-dim axes later (SURVEY.md
section 2.9), but capability parity requires only DP.
"""

from __future__ import annotations


import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n_devices (0 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return jax.device_put(batch, sh)


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicate(mesh))
