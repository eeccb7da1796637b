"""Auto-placement solver (reference toolkits/auto_placement analog).

Economics encoded: with perfectly linear phase scaling, collocation always
(weakly) wins — max(R/k, T/(N-k)) >= (R+T)/N. Disaggregation pays when a
phase scales sublinearly (decode is latency/HBM-bound) or collocation carries
switching costs (engine offload/onload between phases).
"""

import pytest

from rlinf_tpu.utils.auto_placement import (
    PhaseCost,
    phase_costs_from_metrics,
    solve_placement,
)


def test_linear_scaling_prefers_collocation():
    plan = solve_placement(
        8,
        PhaseCost("rollout", 10.0, 1),
        PhaseCost("train", 10.0, 1),
        sync_disaggregated_s=0.05,
    )
    assert plan.mode == "collocated"
    assert plan.step_seconds == pytest.approx(2.5, abs=1e-6)
    assert plan.component_placement(8) == {"rollout": "0-7", "actor": "0-7"}


def test_sublinear_rollout_prefers_disaggregation():
    """Decode at fixed batch barely scales (alpha=0.1): chips beyond a few
    are wasted on rollout, so pin rollout to one chip and overlap."""
    plan = solve_placement(
        8,
        PhaseCost("rollout", 2.0, 1, scaling_alpha=0.1),
        PhaseCost("train", 10.0, 1),
        sync_disaggregated_s=0.0,
    )
    # collocated: 2*(1/8)^0.1 + 10/8 ~= 2.87
    # disagg k=2: max(2*(1/2)^0.1, 10/6) = 1.866  <- best split
    assert plan.mode == "disaggregated"
    assert plan.rollout_chips == 2
    assert plan.step_seconds == pytest.approx(1.8661, abs=1e-3)


def test_collocated_switching_cost_tips_the_balance():
    """Offload/onload between phases (the reference's engine memory swap)
    charged to collocation makes the pipelined split win."""
    kw = dict(
        rollout=PhaseCost("rollout", 8.0, 1, scaling_alpha=0.5),
        train=PhaseCost("train", 8.0, 1),
    )
    cheap = solve_placement(8, sync_collocated_s=0.0,
                            sync_disaggregated_s=0.2, **kw)
    costly = solve_placement(8, sync_collocated_s=3.0,
                             sync_disaggregated_s=0.2, **kw)
    assert costly.step_seconds <= cheap.step_seconds + 3.0
    assert costly.mode == "disaggregated"


def test_phase_costs_from_metrics():
    hist = [
        {"time/rollout": 9.0, "time/training": 9.0},  # warmup, skipped
        {"time/rollout": 9.0, "time/training": 9.0},
        {"time/rollout": 1.0, "time/training": 2.0},
        {"time/rollout": 1.2, "time/training": 2.2},
    ]
    costs = phase_costs_from_metrics(hist, chips=4)
    assert costs["rollout"].seconds == pytest.approx(1.1)
    assert costs["train"].seconds == pytest.approx(2.1)
    assert costs["rollout"].ref_chips == 4
