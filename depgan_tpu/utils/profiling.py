"""Tracing / profiling utilities (SURVEY.md §5).

The reference's only timing is a wall-clock delta printed in the training
progress line (`...twoCritics_training_4fold.py:779,844`). Here:

- :class:`StepTimer` — rolling per-step wall times + steps/sec, logged as
  TensorBoard scalars.
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace for a window of steps.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


class StepTimer:
    def __init__(self, window: int = 50):
        self._t0 = time.perf_counter()
        self._last = self._t0
        self._durations: deque[float] = deque(maxlen=window)

    def step(self) -> float:
        """Mark a step boundary; returns the last step's duration."""
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._durations.append(dt)
        return dt

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        if not self._durations:
            return 0.0
        return len(self._durations) / sum(self._durations)

    def log_to(self, logger, step: int) -> None:
        logger.log_scalar("perf/step_seconds", self._durations[-1] if self._durations else 0.0, step)
        logger.log_scalar("perf/steps_per_sec", self.steps_per_sec, step)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace window; view in TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
