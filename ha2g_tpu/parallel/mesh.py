"""Device mesh + sharding helpers.

The reference's only parallelism is single-host torch DataParallel
(train.py:132-143).  The TPU-native replacement is SPMD: a 1-D 'data' mesh
over ICI, batch-dim-sharded inputs, replicated parameters, and XLA-inserted
collectives for the gradient all-reduce (implicit in jit over the mesh).
Capability parity requires only DP (SURVEY.md section 2.9); the hybrid
2-D 'data' x 'model' mesh below is the TPU-native scaling superset —
parameters and optimizer state sharded FSDP/ZeRO-style over 'model'
(largest divisible dim), gathered on use and reduce-scattered on the
gradient by XLA's GSPMD partitioner, while the batch stays sharded over
'data'.  Numeric equivalence vs single-device is asserted in
tests/test_parallel.py for both mesh shapes.
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


def hybrid_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh: batch shards over 'data', parameters and
    optimizer state shard over 'model' (see fsdp_sharding)."""
    devs = list(devices if devices is not None else jax.devices())
    assert len(devs) >= n_data * n_model, (len(devs), n_data, n_model)
    arr = np.asarray(devs[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape, n_model: int, min_size: int) -> P:
    """Partition the largest dim divisible by n_model over 'model';
    small/indivisible leaves stay replicated (their memory is noise and
    sharding them would only add collective latency)."""
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if shape[d] >= n_model and shape[d] % n_model == 0:
            return P(*([None] * d + ["model"]))
    return P()


def fsdp_sharding(tree, mesh: Mesh, min_size: int = 2048):
    """Per-leaf NamedSharding tree for FSDP/ZeRO-style parameter +
    optimizer-state placement over the mesh's 'model' axis.  Works on any
    pytree (params, optax state, or a whole train-state dataclass: scalar
    leaves like step counters fall through to replicated)."""
    n_model = mesh.shape["model"]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, _fsdp_spec(tuple(np.shape(x)), n_model, min_size)), tree)


def shard_state_fsdp(state, mesh: Mesh, min_size: int = 2048):
    """Place a train state on the hybrid mesh: every large leaf sharded
    over 'model', the rest replicated."""
    return jax.device_put(state, fsdp_sharding(state, mesh, min_size))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return jax.device_put(batch, sh)


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicate(mesh))
