"""Profiling / tracing hooks (SURVEY.md §5.1 — the reference has none).

``trace`` wraps a region in a ``jax.profiler`` trace viewable in TensorBoard /
Perfetto; ``StepTimer`` gives cheap per-step wall-time stats for the
samples/sec/chip north-star without a full trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-time-per-step tracker (host-side; call after a blocking op)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def rate(self, items_per_step: int = 1) -> float:
        m = self.mean
        return items_per_step / m if m > 0 else 0.0
