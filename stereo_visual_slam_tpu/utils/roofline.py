"""Roofline / MFU accounting for the production programs.

FLOP and HBM-byte counts come from XLA's own post-optimization cost model
(`compiled.cost_analysis()`), so they track the program actually executed —
fusion, rematerialization and layout padding included — rather than a
hand-derived estimate. Peaks are the TPU v5e (v5 lite) datasheet numbers;
MFU is reported against the bf16 matmul peak (the pipeline's matmuls run
bf16 with f32 accumulation; scores/geometry stay f32 on the VPU, so this is
the conservative convention).

Used by tools/roofline_report.py (per-phase table) and bench.py (one
summary line on stderr). The measured times must come from wall-clock over
drained runs or the two-length fori method (tools/profile_production.py) —
single-dispatch timings lie on the axon tunnel.
"""

from __future__ import annotations

from typing import NamedTuple


class ChipPeaks(NamedTuple):
    name: str
    bf16_flops: float     # FLOP/s
    hbm_bytes: float      # B/s


# TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM (public datasheet numbers).
TPU_V5E = ChipPeaks("TPU v5e", 197e12, 819e9)
# Virtual/CPU fallback so the tools run anywhere (numbers meaningless).
GENERIC = ChipPeaks("generic", 1e12, 100e9)


def chip_peaks() -> ChipPeaks:
    import jax

    plat = jax.default_backend()
    if plat in ("tpu", "axon"):
        return TPU_V5E
    return GENERIC


class ProgramCost(NamedTuple):
    flops: float
    bytes_accessed: float

    def mfu(self, seconds: float, peaks: ChipPeaks | None = None) -> float:
        p = peaks or chip_peaks()
        return self.flops / max(seconds, 1e-12) / p.bf16_flops

    def hbm_util(self, seconds: float, peaks: ChipPeaks | None = None) -> float:
        p = peaks or chip_peaks()
        return self.bytes_accessed / max(seconds, 1e-12) / p.hbm_bytes


def cost_of(jitted, *args, **kwargs) -> ProgramCost:
    """XLA cost analysis of a jitted callable at the given args. Compiles
    (persistent-cache warm) but does not execute."""
    compiled = jitted.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    ca = ca or {}
    return ProgramCost(
        flops=float(ca.get("flops", 0.0)),
        bytes_accessed=float(ca.get("bytes accessed", 0.0)),
    )


def summarize(label: str, cost: ProgramCost, seconds: float) -> str:
    p = chip_peaks()
    return (
        f"{label}: {cost.flops/1e9:.1f} GFLOP, "
        f"{cost.bytes_accessed/1e9:.2f} GB HBM, {seconds*1e3:.1f} ms -> "
        f"{100*cost.mfu(seconds, p):.1f}% MFU / "
        f"{100*cost.hbm_util(seconds, p):.0f}% HBM bw "
        f"({p.name}: {p.bf16_flops/1e12:.0f} TFLOP/s bf16, "
        f"{p.hbm_bytes/1e9:.0f} GB/s)"
    )
