"""Tracing / profiling — the aux subsystem the reference lacks (SURVEY.md §5).

The reference's only instrumentation is tqdm bars and a per-item dataset
timer (utils.py:120-122).  Here:

  - ``trace(dir)``: context manager around ``jax.profiler`` start/stop_trace;
    produces a TensorBoard-loadable xplane dump of device execution
  - ``StepTimer``: wall-clock per-step timing with images/sec/chip derivation
    (the BASELINE.json headline unit) and warmup-aware summaries
  - ``annotate(name)``: TraceAnnotation passthrough for custom spans
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block into log_dir (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall times → images/sec/chip (skipping compile steps)."""

    def __init__(self, images_per_step: int, n_chips: int = 1, warmup: int = 1):
        self.images_per_step = images_per_step
        self.n_chips = max(n_chips, 1)
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = None
        return dt

    @property
    def steady_times(self) -> List[float]:
        return self.times[self.warmup:] if len(self.times) > self.warmup \
            else self.times

    def images_per_sec_per_chip(self) -> float:
        ts = self.steady_times
        if not ts:
            return 0.0
        return self.images_per_step / (sum(ts) / len(ts)) / self.n_chips

    def summary(self) -> dict:
        ts = self.steady_times
        return {
            "steps": len(self.times),
            "mean_s": sum(ts) / len(ts) if ts else 0.0,
            "min_s": min(ts) if ts else 0.0,
            "images_per_sec_per_chip": self.images_per_sec_per_chip(),
        }
