"""Profiling and roofline utilities.

The reference instruments only tic/toc wall-clock arrays
(reference: README.md:423,445,505-570; SURVEY.md section 5.1).  Here:
`jax.profiler` trace capture plus an XLA-cost-analysis-based roofline
report (achieved FLOP/s and bytes/s vs device peaks) for any jitted
function -- the per-kernel speed-of-light accounting BASELINE.json asks
for.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass

import jax

# Peak numbers for roofline normalization (per chip).
DEVICE_PEAKS = {
    # (f32 FLOP/s, bf16 FLOP/s, HBM bytes/s)
    "v5e": (98e12 / 2, 197e12, 819e9),
    "v5p": (459e12 / 2, 459e12, 2765e9),
    "cpu": (5e10, 5e10, 5e10),
}


def device_kind() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    return "cpu"


@dataclass
class RooflineReport:
    wall_s: float
    flops: float
    bytes_accessed: float
    achieved_flops_per_s: float
    achieved_bytes_per_s: float
    flop_utilization: float       # vs f32 peak
    bandwidth_utilization: float
    bound: str                    # "compute" | "memory"

    def __str__(self) -> str:
        return (f"wall {self.wall_s*1e3:.2f} ms | "
                f"{self.achieved_flops_per_s/1e12:.2f} TFLOP/s "
                f"({self.flop_utilization*100:.1f}% peak) | "
                f"{self.achieved_bytes_per_s/1e9:.1f} GB/s "
                f"({self.bandwidth_utilization*100:.1f}% peak) | "
                f"{self.bound}-bound")


def roofline(fn, *args, repeats: int = 5) -> RooflineReport:
    """Compile fn(*args), read XLA cost analysis, time it, and place it on
    the device roofline."""
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    out = compiled(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = compiled(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    peak_f32, _, peak_bw = DEVICE_PEAKS[device_kind()]
    fps = flops / best
    bps = bytes_accessed / best
    fu = fps / peak_f32
    bu = bps / peak_bw
    return RooflineReport(
        wall_s=best, flops=flops, bytes_accessed=bytes_accessed,
        achieved_flops_per_s=fps, achieved_bytes_per_s=bps,
        flop_utilization=fu, bandwidth_utilization=bu,
        bound="compute" if fu >= bu else "memory",
    )


@contextmanager
def trace(log_dir: str = "/tmp/mpcsao_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def timed(label: str, sink=None):
    """tic/toc equivalent (README.md:445,624) with optional sink list."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))
