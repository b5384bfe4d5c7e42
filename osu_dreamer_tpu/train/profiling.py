"""Profiling / tracing hooks.

The reference has no profiling beyond tqdm (SURVEY.md §5); this rebuild adds
first-class tracing: ``jax.profiler`` device traces viewable in
TensorBoard/Perfetto, step-time tracking with compile-step exclusion, and
annotated trace regions for pipeline stages.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str | Path):
    """capture a device trace (XLA ops, fusion, HBM) for the enclosed block;
    view with TensorBoard's profile plugin or Perfetto"""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """annotated trace region (shows up as a named span in traces)"""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """wall-clock step-time stats that discard warmup/compile steps"""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._times: list[float] = []
        self._seen = 0
        self._last: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._seen += 1
            if self._seen > self.skip_first:
                self._times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return 1.0 / float(np.mean(self._times))

    def summary(self) -> dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": self.steps_per_sec,
        }
