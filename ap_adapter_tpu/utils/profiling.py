"""Tracing / profiling hooks.

The reference has none (SURVEY §5) — only tqdm bars. Here: ``jax.profiler``
trace capture around any callable plus lightweight phase timers whose results
land in the metrics JSONL.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Wall-clock timers for pipeline phases (encode / denoise / decode)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            name: {"total_s": t, "count": self.counts[name], "mean_s": t / self.counts[name]}
            for name, t in self.totals.items()
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace", host_only: bool = False):
    """Capture a jax.profiler trace (viewable in XProf/TensorBoard)."""

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, iters: int = 1, **kwargs) -> float:
    """Run fn iters times, blocking on the result; returns seconds/iter."""

    out = fn(*args, **kwargs)  # warmup/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
