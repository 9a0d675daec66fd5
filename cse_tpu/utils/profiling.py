"""Tracing/profiling — a first-class improvement over the reference, which has
no profiler at all (SURVEY.md §5.1): jax.profiler traces on demand.

Usage:
    with trace_if("/tmp/tb_trace", step, start=100, stop=105):
        run_step(...)
or set CSE_TPU_PROFILE=/path to capture steps 10-20 of any training run.
"""

from __future__ import annotations

import contextlib
import os

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
