"""Parity harness: spearman, baseline comparison, crash classification."""

import json
import numpy as np

from rlinf_tpu.utils.parity import (
    ParityResult,
    classify_log,
    compare_to_baseline,
    load_baseline,
    load_metric_series,
    save_baseline,
    spearman,
)


def test_spearman_basic():
    assert abs(spearman([1, 2, 3, 4], [2, 4, 6, 8]) - 1.0) < 1e-9
    assert abs(spearman([1, 2, 3, 4], [8, 6, 4, 2]) + 1.0) < 1e-9
    assert abs(spearman([1, 2, 3, 4], [1, 3, 2, 4]) - 0.8) < 1e-9


def test_compare_learning_curves_pass():
    base = np.linspace(0, 1, 40) ** 0.5  # rising curve
    run = base + np.random.default_rng(0).normal(0, 0.03, 40)
    res = compare_to_baseline(run, base)
    assert res.passed and res.spearman > 0.9


def test_compare_flat_run_fails():
    base = np.linspace(0, 1, 40) ** 0.5
    run = np.full(40, 0.1)
    res = compare_to_baseline(run, base)
    assert not res.passed
    assert res.final_gap > 0.5


def test_baseline_roundtrip(tmp_path):
    path = str(tmp_path / "b.json")
    save_baseline(path, [0.1, 0.5, 0.9], meta={"task": "toy"})
    assert load_baseline(path) == [0.1, 0.5, 0.9]


def test_load_metric_series(tmp_path):
    p = tmp_path / "metrics.jsonl"
    rows = [{"step": i, "env/success_once": i / 10} for i in range(5)]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    steps, vals = load_metric_series(str(p), "env/success_once")
    assert list(steps) == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(vals, [0, 0.1, 0.2, 0.3, 0.4])


def test_classify_log():
    assert classify_log("xx RESOURCE_EXHAUSTED: while allocating") == "oom"
    assert classify_log("Traceback (most recent call last):\n...") == "traceback"
    assert classify_log("all good") is None
