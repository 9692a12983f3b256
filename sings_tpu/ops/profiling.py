"""Profiling / tracing utilities.

The reference has no tracing at all (SURVEY.md section 5 — the only
timing is a wall-clock around animation). Here:
  * `trace(dir)` context manager wraps jax.profiler for TensorBoard/
    Perfetto traces of the jitted step;
  * `StepTimer` measures steady-state step time and derives the
    Mpix/s counter used by bench.py;
  * `annotate` marks host-side phases inside traces.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock timer with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def mean_s(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n

    def mpix_s(self, height: int, width: int) -> float:
        return height * width / max(self.mean_s, 1e-12) / 1e6
