"""Transient-fault re-execution ("rerun") harness with error injection.

Reference analog: the Megatron rerun state machine wired through
rlinf/utils/initialize.py:26-31,106-110 (re-execute a training step on
suspected transient faults, with a RerunErrorInjector for testing) — the
reference's only fault-injection surface (SURVEY.md §5.2/§5.3).

The TPU re-design exploits functional purity: a jitted step is
``(state, batch) -> (state, metrics)`` with no hidden mutation, so re-running
it from the SAME inputs is always safe — no optimizer/RNG state rollback
machinery needed. The harness:

  * retries a step up to ``max_reruns`` times on exception;
  * classifies the outcome by comparing runs — TRANSIENT (a retry
    succeeded, or two result fingerprints disagree: flaky hardware),
    PERSISTENT (every attempt failed identically: a real bug),
    NONDETERMINISTIC (validation mode found mismatching fingerprints);
  * optional ``validate_determinism`` mode re-executes every step and
    compares result fingerprints (the reference's rerun "validation" mode);
  * ``ErrorInjector`` deterministically injects exceptions or result
    corruption at chosen steps for tests.
"""

from __future__ import annotations

import dataclasses
import enum
import logging
from typing import Any, Callable, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class RerunVerdict(enum.Enum):
    OK = "ok"
    TRANSIENT = "transient"            # recovered by re-execution
    PERSISTENT = "persistent"          # failed identically every attempt
    NONDETERMINISTIC = "nondeterministic"  # same inputs, different results


class InjectionKind(enum.Enum):
    EXCEPTION = "exception"            # raise on the first attempt
    CORRUPT_RESULT = "corrupt_result"  # perturb the first attempt's result
    PERSISTENT_EXCEPTION = "persistent_exception"  # raise on every attempt


@dataclasses.dataclass
class ErrorInjector:
    """Deterministic fault injection (reference RerunErrorInjector analog)."""

    inject_at_steps: Tuple[int, ...] = ()
    kind: InjectionKind = InjectionKind.EXCEPTION

    def maybe_fail(self, step: int, attempt: int):
        if step not in self.inject_at_steps:
            return
        if self.kind is InjectionKind.PERSISTENT_EXCEPTION:
            raise RuntimeError(f"[injected persistent fault @ step {step}]")
        if self.kind is InjectionKind.EXCEPTION and attempt == 0:
            raise RuntimeError(f"[injected transient fault @ step {step}]")

    def maybe_corrupt(self, step: int, attempt: int, fingerprint: float) -> float:
        if (
            step in self.inject_at_steps
            and self.kind is InjectionKind.CORRUPT_RESULT
            and attempt == 0
        ):
            return fingerprint + 1.0
        return fingerprint


def _fingerprint(result: Any) -> float:
    """Order-stable scalar digest of a pytree result (forces execution,
    which is also what surfaces deferred XLA faults)."""
    import jax

    total = 0.0
    for leaf in jax.tree_util.tree_leaves(result):
        arr = np.asarray(leaf, np.float64)
        finite = np.where(np.isfinite(arr), arr, 0.0)
        total += float(finite.sum()) + 1e3 * float((~np.isfinite(arr)).sum())
    return total


@dataclasses.dataclass
class RerunReport:
    verdict: RerunVerdict
    attempts: int
    step: int
    error: Optional[str] = None


class RerunStateMachine:
    """Wraps a pure step fn with retry + determinism validation.

    Usage::

        rsm = RerunStateMachine(max_reruns=2)
        (state, metrics), report = rsm.run(step, train_step, state, batch)
        if report.verdict is RerunVerdict.PERSISTENT: raise ...
    """

    def __init__(
        self,
        max_reruns: int = 1,
        validate_determinism: bool = False,
        injector: Optional[ErrorInjector] = None,
    ):
        self.max_reruns = max_reruns
        self.validate_determinism = validate_determinism
        self.injector = injector
        self.reports: list[RerunReport] = []

    def run(self, step: int, fn: Callable, *args, **kwargs):
        last_err: Optional[BaseException] = None
        result = None
        fp = None
        for attempt in range(self.max_reruns + 1):
            try:
                if self.injector:
                    self.injector.maybe_fail(step, attempt)
                result = fn(*args, **kwargs)
                fp = _fingerprint(result)
                if self.injector:
                    fp = self.injector.maybe_corrupt(step, attempt, fp)
            except Exception as e:  # noqa: BLE001 — harness boundary
                if last_err is not None and type(e) is type(last_err) and str(
                    e
                ) == str(last_err):
                    report = RerunReport(
                        RerunVerdict.PERSISTENT, attempt + 1, step, str(e)
                    )
                    self.reports.append(report)
                    raise
                last_err = e
                logger.warning("step %d attempt %d failed: %s", step, attempt, e)
                continue

            if self.validate_determinism or last_err is not None:
                # one confirming re-execution from the same inputs
                result2 = fn(*args, **kwargs)
                fp2 = _fingerprint(result2)
                if not np.isclose(fp, fp2, rtol=0, atol=0):
                    report = RerunReport(
                        RerunVerdict.NONDETERMINISTIC, attempt + 2, step,
                        f"fingerprints differ: {fp} vs {fp2}",
                    )
                    self.reports.append(report)
                    return result2, report
                result, fp = result2, fp2

            verdict = RerunVerdict.TRANSIENT if last_err else RerunVerdict.OK
            report = RerunReport(
                verdict, attempt + 1, step,
                str(last_err) if last_err else None,
            )
            self.reports.append(report)
            return result, report

        report = RerunReport(
            RerunVerdict.PERSISTENT, self.max_reruns + 1, step, str(last_err)
        )
        self.reports.append(report)
        assert last_err is not None
        raise last_err
