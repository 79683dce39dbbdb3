"""Tracing / profiling hooks (SURVEY.md §5: the reference has none beyond
tqdm — this is the TPU build's observability subsystem).

- WindowTimer: per-window wall-clock stats (p50/p95/mean) for the pipeline.
- trace(): context manager around jax.profiler for XLA-level traces
  viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class WindowTimer:
    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.samples.items():
            s = sorted(ts)
            n = len(s)
            out[name] = {
                "count": n,
                "mean_ms": 1000 * sum(s) / n,
                "p50_ms": 1000 * s[n // 2],
                "p95_ms": 1000 * s[min(n - 1, int(0.95 * n))],
                "total_ms": 1000 * sum(s),
            }
        return out


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """XLA profiler trace; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
