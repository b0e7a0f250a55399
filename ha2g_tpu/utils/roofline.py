"""Roofline / MFU accounting (VERDICT r3 item 2).

Analytic FLOP counts come from XLA's compiled cost analysis — the count of
floating-point operations in the optimized HLO the chip actually executes
(matmul/conv = 2*M*N*K etc.), which is the honest numerator for MFU: it
includes rematerialization the compiler chose and excludes ops it fused
away.  The denominator is the chip's published peak.

Peak table: TPU v5e ("TPU v5 lite", the chip behind this image's tunnel)
peaks at 197 TFLOP/s bf16 / 394 TOPS int8 per chip (public spec).  The
flagship configs run bf16 compute (configs/hierarchy.yaml via
ops/precision.py), so bf16 peak is the applicable roofline; fp32-resident
ops (losses, softmaxes) make the stated MFU slightly conservative.

No reference counterpart (SURVEY.md section 6 — the reference never reports
utilization); this bar is ours.
"""

from __future__ import annotations

from typing import Optional

# chip peak dense-matmul throughput in TFLOP/s at the bf16 compute dtype
# the flagship uses; device_kind strings as jax reports them
PEAK_TFLOPS_BF16 = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def device_peak_tflops() -> Optional[float]:
    import jax
    kind = jax.devices()[0].device_kind
    return PEAK_TFLOPS_BF16.get(kind)


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of one call of a jitted function per XLA cost analysis, or
    None when the backend does not expose it."""
    try:
        ca = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", -1.0))
        return f if f > 0 else None
    except Exception:
        return None


def mfu_line(flops: Optional[float], seconds: float) -> str:
    """'X.XX TFLOP/s = Y.Y% of <chip> bf16 peak (P TFLOP/s), F GFLOP/call'
    — or a stated reason when either half is unavailable."""
    import jax
    if flops is None:
        return "flops unavailable (backend exposes no cost analysis)"
    tflops = flops / seconds / 1e12
    peak = device_peak_tflops()
    kind = jax.devices()[0].device_kind
    if peak is None:
        return (f"{tflops:.2f} TFLOP/s ({flops / 1e9:.1f} GFLOP/call; "
                f"no peak table entry for {kind!r})")
    return (f"{tflops:.2f} TFLOP/s = {100.0 * tflops / peak:.1f}% of "
            f"{kind} bf16 peak ({peak:.0f} TFLOP/s), "
            f"{flops / 1e9:.1f} GFLOP/call")
