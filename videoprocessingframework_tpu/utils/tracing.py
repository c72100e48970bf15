"""Trace annotations — the NVTX analog.

The reference wraps every task ``Run()`` in an NVTX range named after the
task (src/TC/inc/Tasks.hpp:27-52, Tasks.cpp:203,362,627). Here the same
stage names become ``jax.profiler.TraceAnnotation`` scopes so XLA /
TensorBoard profiles show identical stage labels; when profiling is not
active the annotation cost is negligible.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator

_DISABLED = os.environ.get("VPF_TPU_DISABLE_TRACING", "0") not in ("0", "")


@contextlib.contextmanager
def trace_range(name: str) -> Iterator[None]:
    """Named trace scope (NVTX_PUSH/POP analog)."""
    ann = None
    if not _DISABLED:
        try:
            import jax.profiler

            ann = jax.profiler.TraceAnnotation(name)
        except Exception:
            ann = None
    if ann is None:
        yield
    else:
        with ann:
            yield


class StageTimer:
    """Lightweight per-stage wall-clock accumulation for pipeline stats."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(1, self.counts[k]),
            }
            for k in self.totals
        }
