"""MFU / roofline accounting for benchmarked programs.

The north-star performance target is judged against chip capability, so every
headline component timing carries a model-FLOPs-utilization number: XLA's own
cost analysis of the compiled program (FLOPs + bytes accessed) divided by the
measured fenced wall time and the chip's peak. This distinguishes "at the
hardware roofline" from "XLA is leaving a multiple on the floor" — the
reference has no notion of this (its perf evidence is tqdm rates,
SURVEY.md §5 tracing).

Peak numbers are the published per-chip specs (dense bf16 matmul TFLOP/s and
HBM GB/s):

- TPU v4:  275 TFLOP/s, 1228 GB/s
- TPU v5e: 197 TFLOP/s,  819 GB/s
- TPU v5p: 459 TFLOP/s, 2765 GB/s
- TPU v6e: 918 TFLOP/s, 1640 GB/s

CPU rows use a nominal 1 TFLOP/s / 100 GB/s so the code paths stay testable
off-TPU; the utilization numbers are only meaningful on real chips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

# substring of jax Device.device_kind (lowercased) -> (TFLOP/s bf16, HBM GB/s)
_PEAKS = (
    ("v6e", 918.0, 1640.0),
    ("trillium", 918.0, 1640.0),
    ("v5p", 459.0, 2765.0),
    ("v5e", 197.0, 819.0),
    ("v5 lite", 197.0, 819.0),
    ("v5litepod", 197.0, 819.0),
    ("v4", 275.0, 1228.0),
    ("cpu", 1.0, 100.0),
)


def chip_peaks(device=None):
    """(peak_flops_per_s, peak_bytes_per_s) for a jax device."""
    if device is None:
        import jax

        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for sub, tf, gb in _PEAKS:
        if sub in kind:
            return tf * 1e12, gb * 1e9
    return 1e12, 100e9  # unknown chip: nominal, flagged by name in the report


@dataclass
class ProgramCost:
    """XLA cost analysis of one compiled program."""

    flops: float
    bytes_accessed: float

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / max(self.bytes_accessed, 1.0)


def _pick(analysis) -> Optional[ProgramCost]:
    """Normalize jax cost_analysis return shapes (dict or [dict])."""
    if analysis is None:
        return None
    if isinstance(analysis, (list, tuple)):
        if not analysis:
            return None
        analysis = analysis[0]
    flops = float(analysis.get("flops", 0.0) or 0.0)
    byts = float(analysis.get("bytes accessed", 0.0) or 0.0)
    if flops <= 0.0:
        return None
    return ProgramCost(flops, byts)


def program_cost(fn, *args, **kwargs) -> Optional[ProgramCost]:
    """Cost analysis of ``jit(fn)(*args)`` without paying a second device
    compile: ``Lowered.cost_analysis`` runs XLA's HloCostAnalysis locally on
    the lowered module (dot/conv FLOPs are optimization-invariant; bytes are
    the pre-fusion estimate, i.e. an upper bound on true HBM traffic).
    Falls back to the compiled executable's analysis, then to None (callers
    must tolerate missing cost data — some backends expose neither)."""
    import jax

    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
    except Exception:
        return None
    try:
        cost = _pick(lowered.cost_analysis())
        if cost is not None:
            return cost
    except Exception:
        pass
    try:
        return _pick(lowered.compile().cost_analysis())
    except Exception:
        return None


def describe(name: str, cost: Optional[ProgramCost], seconds: float,
             device=None) -> str:
    """One MFU/roofline line for a measured component.

    The bound verdict compares the program's arithmetic intensity against the
    machine balance (peak FLOPs / peak bytes): programs below balance are
    HBM-bound at best, so the honest ceiling is bandwidth utilization, not
    MFU.
    """
    if cost is None or seconds <= 0:
        return f"{name}: mfu n/a (no cost analysis available)"
    peak_f, peak_b = chip_peaks(device)
    mfu = cost.flops / seconds / peak_f
    bwu = cost.bytes_accessed / seconds / peak_b
    balance = peak_f / peak_b
    bound = "compute-bound" if cost.arithmetic_intensity >= balance else "HBM-bound"
    return (f"{name}: {cost.flops / 1e9:.1f} GFLOP, "
            f"{cost.bytes_accessed / 1e9:.2f} GB accessed, "
            f"intensity {cost.arithmetic_intensity:.0f} flop/B "
            f"({bound}; balance {balance:.0f}) -> "
            f"MFU {mfu * 100:.1f}%, HBM {bwu * 100:.1f}% of peak")


def summarize(name: str, cost: Optional[ProgramCost], seconds: float,
              device=None) -> dict:
    """Machine-readable MFU record for the bench JSON artifact."""
    if cost is None or seconds <= 0:
        return {"component": name, "mfu": None}
    peak_f, peak_b = chip_peaks(device)
    return {
        "component": name,
        "gflop": round(cost.flops / 1e9, 2),
        "gb_accessed": round(cost.bytes_accessed / 1e9, 3),
        "ms": round(seconds * 1e3, 2),
        "mfu": round(cost.flops / seconds / peak_f, 4),
        "hbm_util": round(cost.bytes_accessed / seconds / peak_b, 4),
    }
