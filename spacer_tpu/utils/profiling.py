"""Profiling hooks (SURVEY.md section 5: the reference has wall-clock timing
only; here the JAX profiler is a first-class utility)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Per-stage wall-clock accounting (rollout/reward/update splits)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.marks: list[tuple[str, float]] = []

    def mark(self, name: str):
        self.marks.append((name, time.perf_counter()))

    def splits(self) -> dict[str, float]:
        out = {}
        prev = self.t0
        for name, t in self.marks:
            out[name] = t - prev
            prev = t
        return out
