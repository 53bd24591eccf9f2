"""Profiling & observability.

The reference's tracing is wall-clock prints (timePrint/CurrentTime,
localfunctions.py:104-117) plus tqdm. TPU-native replacements:

- ``trace(logdir)``: context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard/XProf;
- ``annotate(name)``: op-level trace annotation;
- ``StepTimer``: per-step wall timing with points/sec accounting, mirroring
  the BASELINE.json headline metric;
- ``device_fence()``: reliable completion barrier (a tiny scalar readback —
  on this image's tunneled TPU, block_until_ready alone does not fence).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace into ``logdir`` (TensorBoard 'profile' plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Scope annotation that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_fence(x=None) -> None:
    """Force all queued device work to complete (scalar readback)."""
    if x is None:
        x = jnp.zeros(())
    float(jnp.sum(x))


class StepTimer:
    """Accumulates per-step durations and derives throughput."""

    def __init__(self, points_per_step: int):
        self.points_per_step = points_per_step
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self.durations.append(dt)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    @property
    def mean_step_time(self) -> float:
        return sum(self.durations) / max(len(self.durations), 1)

    @property
    def points_per_sec(self) -> float:
        m = self.mean_step_time
        return self.points_per_step / m if m > 0 else 0.0

    def report(self) -> str:
        return (f"steps={len(self.durations)} "
                f"mean={self.mean_step_time * 1e3:.2f}ms "
                f"points/sec={self.points_per_sec:,.0f}")
