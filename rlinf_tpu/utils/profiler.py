"""Profiling hooks: jax.profiler traces with step-window gating.

Reference analog: PyTorchProfiler with fwd/bwd-scheduled chrome-trace export
(reference rlinf/utils/profiler.py:46-214) and the nsys/rocprof step-window
wrapping injected per worker (cluster/cluster.py:565-657, step gating
embodied_runner.py:459-477). On TPU one tool covers both: the XLA profiler
captures device traces (op timeline, HBM, ICI) viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class ProfilerConfig:
    """Mirrors the reference ``cluster.profiling`` YAML group."""

    enabled: bool = False
    output_dir: str = "profiles"
    start_step: int = 3          # skip compile/warmup steps
    num_steps: int = 2


class StepProfiler:
    """Call ``step_start/step_end`` around each global step; a trace is
    captured for steps [start_step, start_step + num_steps)."""

    def __init__(self, cfg: ProfilerConfig):
        self.cfg = cfg
        self._active = False
        self._step = 0

    def step_start(self):
        if (
            self.cfg.enabled
            and not self._active
            and self._step == self.cfg.start_step
        ):
            os.makedirs(self.cfg.output_dir, exist_ok=True)
            jax.profiler.start_trace(self.cfg.output_dir)
            self._active = True

    def step_end(self):
        self._step += 1
        if (
            self._active
            and self._step >= self.cfg.start_step + self.cfg.num_steps
        ):
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
