"""Profiling / tracing hooks (aux subsystem the reference lacks —
SURVEY.md §5 'Tracing/profiling: none beyond wall-clock meters').

`StepProfiler` wraps a window of training steps in a `jax.profiler.trace`
so the XLA execution timeline (including ICI collectives) can be inspected
in TensorBoard/XProf.  `AverageMeter` mirrors the reference's running
meters (utils/util_train.py:62-77) for host-side timing stats.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax


class AverageMeter:
    """Running value/avg/sum/count — utils/util_train.py:62-77."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class StepProfiler:
    """Trace steps [start, stop) of an epoch into run_dir/profile."""

    def __init__(self, run_dir: str, start_step: int = 5, num_steps: int = 5,
                 enabled: bool = False):
        self.log_dir = os.path.join(run_dir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self.enabled = enabled
        self._active = False

    def step(self, step_idx: int) -> None:
        if not self.enabled:
            return
        if step_idx == self.start_step and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step_idx == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
            self.enabled = False  # one window per run

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class Stopwatch:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
