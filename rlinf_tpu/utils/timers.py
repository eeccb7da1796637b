"""Phase timers: the per-method timing the reference harvests from workers.

Reference analog: Worker.worker_timer() accumulating per-method durations +
WorkerGroupFuncResult.consume_duration (reference
rlinf/scheduler/worker/worker.py:1286-1347, worker_group.py:500-541) and the
driver-side ScopedTimer (rlinf/utils/distributed.py:1272).

JAX note: ``Timer.scope(..., block=True)`` calls
``jax.block_until_ready`` on a representative output — without it, async
dispatch makes wall-clock phase times meaningless.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Timers:
    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - start
            self._totals[name] += dt
            self._counts[name] += 1

    def record(self, name: str, seconds: float):
        self._totals[name] += seconds
        self._counts[name] += 1

    def consume(self, reduction: str = "sum") -> Dict[str, float]:
        """Pop accumulated durations (reference consume_duration semantics)."""
        if reduction == "mean":
            out = {
                k: self._totals[k] / max(self._counts[k], 1) for k in self._totals
            }
        else:
            out = dict(self._totals)
        self._totals.clear()
        self._counts.clear()
        return out
