"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only instrumentation is per-epoch wall-clock prints
(/root/reference/train_srgan.py:240-249).  Here: `jax.profiler` trace capture
around a step window (view in TensorBoard/Perfetto), a StepTimer producing
steps/sec and imgs/sec, and a NaN/Inf guard for the jitted step's metrics."""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """Capture an XLA/TPU profiler trace for the enclosed block when
    `profile_dir` is set; no-op otherwise."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """steps/sec and images/sec over a sliding window, excluding the first
    (compile) step."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self) -> None:
        self._t0 = None
        self._steps = 0

    def tick(self) -> None:
        if self._t0 is None:          # first tick starts the clock (skip compile)
            self._t0 = time.time()
            return
        self._steps += 1

    @property
    def steps_per_sec(self) -> float:
        if not self._steps or self._t0 is None:
            return 0.0
        return self._steps / max(time.time() - self._t0, 1e-9)

    @property
    def images_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size


def check_finite(metrics: dict, step: int) -> None:
    """Raise on NaN/Inf losses — the failure-detection hook the reference
    lacks entirely (SURVEY.md §5 'Race detection / sanitizers')."""
    for k, v in metrics.items():
        v = float(np.asarray(v))
        if not np.isfinite(v):
            raise FloatingPointError(
                f"non-finite metric {k}={v} at step {step}; "
                "inspect inputs/LR or restore the last checkpoint")
