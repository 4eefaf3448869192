"""Tracing / profiling utilities (SURVEY.md §5.1: absent in the reference —
the TPU build adds jax.profiler trace endpoints + per-step timing).

Usage::

    with trace_if("/tmp/traces", enabled=step == 20):
        state, metrics = train_step(...)

    timer = StepTimer()
    ...
    timer.tick()   # per-step wall clock; .summary() for p50/p90/mean

``start_profiler_server`` exposes the live profiler endpoint so
``tensorboard --logdir`` / ``xprof`` can attach to a running training job.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["start_profiler_server", "trace_if", "StepTimer"]


def start_profiler_server(port: int = 9999) -> None:
    """Start the jax.profiler gRPC server (attach with TensorBoard/xprof)."""
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace_if(log_dir: str, *, enabled: bool = True):
    """Capture a profiler trace of the enclosed block when ``enabled``."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self):
        self._times: list[float] = []
        self._last = time.perf_counter()

    def reset(self) -> None:
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._times.append(dt)
        return dt

    def summary(self) -> dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": int(arr.size),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "max_s": float(arr.max()),
        }
