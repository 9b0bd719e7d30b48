"""Tracing / profiling utilities.

The reference's only instrumentation is manual ``std::chrono`` wall-clock
timing inside tests (SURVEY §5).  Here: a ``jax.profiler`` trace context for
TensorBoard-consumable device traces, and a ``block_until_ready`` FPS
harness used by the benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 10) -> dict:
    """Steady-state timing of a jitted function (seconds + per-call ms)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {"total_s": dt, "per_call_ms": dt / iters * 1e3, "iters": iters}


class StageTimer:
    """Accumulates named host-side stage timings (the FPS harness)."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, dict]:
        return {
            k: {
                "total_s": self.totals[k],
                "mean_ms": self.totals[k] / max(self.counts[k], 1) * 1e3,
                "count": self.counts[k],
            }
            for k in self.totals
        }
