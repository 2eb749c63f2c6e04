"""Tracing / profiling / metrics (SURVEY.md §5).

The reference only has demo-level tic/toc wall prints.  Here:
- Timer: hierarchical named wall-clock sections (host);
- Metrics: structured per-stage counters (nnz predicted vs actual, flops
  true vs padded, bytes, residuals) with a one-line JSON dump — the same
  accounting bench.py reports;
- trace(): context manager around jax.profiler for device traces when a
  real TPU is attached (TPUSPARSE_TRACE_DIR).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from dataclasses import dataclass, field

__all__ = ["Timer", "Metrics", "trace", "flop_report"]


class Timer:
    """Named tic/toc accumulators: the reference's tic()/toc() grown up."""

    def __init__(self):
        self.acc = defaultdict(float)
        self.count = defaultdict(int)
        self._open = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.acc[name] += dt
            self.count[name] += 1

    def report(self) -> str:
        rows = [f"{k}: {v*1e3:.2f} ms (x{self.count[k]})"
                for k, v in sorted(self.acc.items())]
        return "\n".join(rows)


@dataclass
class Metrics:
    """Structured per-stage metrics; merge plans' honest accounting."""
    values: dict = field(default_factory=dict)

    def record(self, **kw) -> "Metrics":
        self.values.update(kw)
        return self

    def record_plan(self, prefix: str, plan) -> "Metrics":
        for attr in ("flops_true", "flops_padded", "lnz", "waste_ratio",
                     "bytes_min", "bytes_padded", "flops",
                     "slot_occupancy"):
            if hasattr(plan, attr):
                v = getattr(plan, attr)
                self.values[f"{prefix}_{attr}"] = (
                    float(v) if isinstance(v, float) else int(v))
        return self

    def json(self) -> str:
        return json.dumps(self.values)


@contextlib.contextmanager
def trace(name: str = "tpusparse"):
    """jax.profiler trace when TPUSPARSE_TRACE_DIR is set; no-op
    otherwise (the axon backend may not support profiling)."""
    outdir = os.environ.get("TPUSPARSE_TRACE_DIR")
    if not outdir:
        yield
        return
    import jax

    try:
        with jax.profiler.trace(os.path.join(outdir, name)):
            yield
    except Exception:
        yield


def flop_report(plan, t_seconds: float) -> dict:
    """Analytic scoring (BASELINE.md probe #1: axon wall-clock is
    non-physical, so report true-vs-issued flops alongside any timing)."""
    out = {"t_seconds": t_seconds}
    if hasattr(plan, "flops_true"):
        out["gflops_true"] = plan.flops_true / t_seconds / 1e9
        out["gflops_issued"] = plan.flops_padded / t_seconds / 1e9
        out["waste_ratio"] = plan.waste_ratio
    if hasattr(plan, "bytes_min"):
        out["gbs_min"] = plan.bytes_min / t_seconds / 1e9
    return out
