"""Persistent XLA compilation-cache setup, keyed per machine.

The cache stores AOT-compiled code; loading blobs compiled on a different
machine type logs cpu_aot_loader SIGILL-risk warnings and can stall a
device thread mid-collective (observed as an XLA:CPU collective-permute
rendezvous timeout).  Keying the directory by (arch, CPU model, jaxlib
version) makes every process on a given machine share compiles while never
loading another machine's code.
"""

import hashlib
import platform


def machine_fingerprint() -> str:
    """Short hash of (arch, CPU model, jaxlib version)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    parts.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        pass
    try:
        import jaxlib
        parts.append(jaxlib.__version__)
    except Exception:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def enable_compilation_cache(min_compile_secs: int = 5,
                             tag: str = "") -> None:
    """Point jax at the machine-fingerprinted persistent cache.  The
    flagship train step takes minutes to compile on this host; caching
    makes repeat invocations start in seconds.  `tag` separates caches
    with different global jax.config (e.g. the test suite's forced-fp32
    matmul precision)."""
    import jax
    suffix = f"_{tag}" if tag else ""
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            f"/tmp/ha2g_jax_cache_{machine_fingerprint()}{suffix}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass  # older jax without the knobs
