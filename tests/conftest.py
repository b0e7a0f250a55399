"""Test environment: force a virtual 8-device CPU mesh BEFORE any test code
touches jax.

Multi-chip sharding tests run against this fake mesh (SURVEY.md section 4);
the real TPU is exercised by bench.py / the driver's compile checks instead.
(Setting JAX_PLATFORMS in os.environ is not enough here: the session's axon
TPU plugin wins platform selection, so we use jax.config explicitly.)
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls in tests: we compare against torch/numpy references
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: the suite is compile-dominated on this
# 1-vCPU host (round-1 wall time 27 min); repeat runs reuse compiled
# programs across processes.  Machine-fingerprinted (utils/jax_cache.py):
# loading XLA:CPU AOT blobs compiled on a different machine type risks
# SIGILL / stalled device threads mid-collective.
from ha2g_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(min_compile_secs=2, tag="tests")
