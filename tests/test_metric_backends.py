"""MetricLogger backend multiplexing + rollout statistics breadth.

Reference analog: rlinf/utils/metric_logger.py:34-174 (wandb/swanlab/
tensorboard backends) and utils/distributed.py:34-186 rollout stats.
wandb/swanlab aren't installed here (zero egress) — fakes verify the
dispatch path, and a missing backend must degrade gracefully.
"""

import sys
import types

import numpy as np
import pytest

from rlinf_tpu.utils.metrics import MetricLogger, rollout_metrics


def _fake_tracker(name):
    calls = {"init": [], "log": [], "finish": 0}
    mod = types.ModuleType(name)

    def init(**kw):
        calls["init"].append(kw)

    def log(scalars, step=None):
        calls["log"].append((step, dict(scalars)))

    def finish():
        calls["finish"] += 1

    mod.init = init
    mod.log = log
    mod.finish = finish
    return mod, calls


def test_wandb_swanlab_backends(monkeypatch, tmp_path):
    wandb_mod, wandb_calls = _fake_tracker("wandb")
    swan_mod, swan_calls = _fake_tracker("swanlab")
    monkeypatch.setitem(sys.modules, "wandb", wandb_mod)
    monkeypatch.setitem(sys.modules, "swanlab", swan_mod)

    logger = MetricLogger(
        str(tmp_path), backends=["wandb", "swanlab"],
        project_name="proj", experiment_name="exp",
        config={"lr": 1e-4}, print_every=0,
    )
    logger.log({"a": 1.0, "b": np.float32(2.5)}, step=3)
    logger.close()

    assert wandb_calls["init"][0]["project"] == "proj"
    assert wandb_calls["log"] == [(3, {"a": 1.0, "b": 2.5})]
    assert wandb_calls["finish"] == 1
    assert swan_calls["init"][0]["experiment_name"] == "exp"
    assert swan_calls["log"] == [(3, {"a": 1.0, "b": 2.5})]
    # jsonl always written
    assert (tmp_path / "metrics.jsonl").exists()


def test_missing_backend_degrades(tmp_path, monkeypatch):
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    logger = MetricLogger(str(tmp_path), backends=["wandb"], print_every=0)
    logger.log({"x": 1.0}, step=0)   # must not raise
    logger.close()


def test_unknown_backend_rejected(tmp_path):
    with pytest.raises(ValueError, match="Unsupported"):
        MetricLogger(str(tmp_path), backends=["mlflow"])


def test_rollout_metrics_breadth():
    lens = np.array([4, 8, 8, 8])
    rewards = np.array([0.0, 1.0, 0.5, -0.5])
    adv = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    mask = np.ones((4, 8), bool)
    mask[0, 4:] = False
    out = rollout_metrics(
        lens, rewards, max_new_tokens=8,
        prompt_lengths=[3, 5, 5, 7], advantages=adv, loss_mask=mask,
    )
    assert out["rollout/response_len_clip_ratio"] == 0.75
    assert out["rollout/response_len_p50"] == 8.0
    assert out["rollout/reward_positive_rate"] == 0.5
    assert out["rollout/prompt_len_mean"] == 5.0
    assert "rollout/advantage_std" in out
    masked_mean = adv[mask].mean()
    np.testing.assert_allclose(out["rollout/advantage_mean"], masked_mean,
                               rtol=1e-5)
