"""Tracing / profiling helpers (SURVEY.md §5: absent in the reference; the
TPU-native plan is jax.profiler traces + per-step timing)."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (perfetto-compatible); no-op without a
    directory."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-time and throughput."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        mean = sum(self._times) / len(self._times)
        return {
            "step_time_s": mean,
            "steps_per_sec": 1.0 / mean,
            "items_per_sec": items_per_step / mean,
        }


def annotate(name: str):
    """TraceAnnotation decorator so custom regions show in the profile."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco


def nan_debug(enable: bool = True) -> None:
    """The debug-flag NaN checker (SURVEY.md §5 race-detection row)."""
    jax.config.update("jax_debug_nans", enable)
