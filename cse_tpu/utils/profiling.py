"""Tracing/profiling — a first-class improvement over the reference, which has
no profiler at all (SURVEY.md §5.1): jax.profiler traces on demand plus a
lightweight step-time aggregator.

Usage:
    with trace_if("/tmp/tb_trace", step, start=100, stop=105):
        run_step(...)
or set CSE_TPU_PROFILE=/path to capture steps 10-20 of any training run.
"""

from __future__ import annotations

import contextlib
import os
import statistics
import time

import jax


@contextlib.contextmanager
def trace_if(logdir: str | None, step: int, start: int = 10, stop: int = 20):
    """Capture a jax.profiler trace for steps in [start, stop)."""
    if logdir and step == start:
        jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        if logdir and step == stop - 1:
            jax.profiler.stop_trace()


def profile_dir_from_env() -> str | None:
    return os.environ.get("CSE_TPU_PROFILE") or None


class StepTimer:
    """Aggregates step wall times; reports p50/p90/mean."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "mean_s": statistics.fmean(ts),
            "p50_s": ts[len(ts) // 2],
            "p90_s": ts[int(len(ts) * 0.9)],
            "n": len(ts),
        }
