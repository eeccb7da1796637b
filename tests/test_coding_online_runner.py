"""Online coding RL runner e2e (VERDICT r3 item 5).

Mirrors the reference's coding online RL path
(reference rlinf/runners/coding_online_rl_runner.py): server-mode rollout
(requests as futures against a continuously-serving engine with live weight
swap), sandboxed code-execution verifier in the reward path, decoupled-PPO
training with version stamps. The learning assertion uses a dense synthetic
shaping (digit-fraction) COMBINED with the real sandboxed exec verifier so
the full subprocess sandbox runs inside the training loop.
"""

import numpy as np
import pytest

from rlinf_tpu.algorithms.rewards.code_verifier import batch_code_rewards
from rlinf_tpu.config import (
    AlgorithmConfig, RunnerConfig, TrainerConfig,
)
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.runners.coding_online_runner import CodingOnlineRunner, CodingTask
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.train_state import OptimizerConfig


def _make_cfg(**overrides):
    base = dict(
        model=LLMConfig(
            vocab_size=258, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, num_kv_heads=2, max_seq_len=128,
            dtype="float32", qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(
            max_new_tokens=8, temperature=1.0, eos_token_id=-1, pad_token_id=0
        ),
        optimizer=OptimizerConfig(lr=5e-3, clip_grad=1.0),
        loss=PolicyLossConfig(
            clip_ratio_low=0.2, clip_ratio_high=0.2, loss_type="decoupled"
        ),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=4, max_steps=30, seed=0),
    )
    base.update(overrides)
    return TrainerConfig(**base)


TASKS = [
    CodingTask(
        prompt=f"write a program for case {i}:",
        test_cases=[{"input": "", "output": ""}],
    )
    for i in range(8)
]


def test_rejects_plain_ppo():
    cfg = _make_cfg(loss=PolicyLossConfig(loss_type="ppo"))
    with pytest.raises(ValueError, match="decoupled"):
        CodingOnlineRunner(cfg, ByteTokenizer(), TASKS)


def test_online_coding_rl_learns():
    """Server-mode online GRPO must raise the reward; the reward runs the
    REAL sandboxed verifier on every response (plus dense digit shaping so a
    tiny random-init model has gradient signal)."""
    exec_calls = {"n": 0}

    def reward_fn(texts, answers):
        exec_calls["n"] += len(texts)
        exec_part = batch_code_rewards(texts, answers, timeout_s=2.0,
                                       partial_credit=True)
        dense = [
            sum(c.isdigit() for c in t) / max(len(t), 1) for t in texts
        ]
        return [0.5 * e + 0.5 * d for e, d in zip(exec_part, dense)]

    cfg = _make_cfg()
    runner = CodingOnlineRunner(
        cfg, ByteTokenizer(), TASKS, reward_fn=reward_fn
    )
    history = runner.run(max_steps=25)

    assert exec_calls["n"] == 25 * 4 * 8  # sandbox ran on every response
    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > first5 + 0.05, f"no learning: {first5:.4f} -> {last5:.4f}"

    # online bookkeeping: version advances every step (initial sync + one
    # per training step), lag stays bounded
    assert history[-1]["online/param_version"] == 26.0
    # pipelined submit (batch N+1 enqueued before step N's sync) bounds the
    # behavior-policy staleness at 2 versions
    assert all(h["online/version_lag"] <= 2.0 for h in history)
    # decoupled loss reported its proximal-anchor metrics
    assert "actor/loss" in history[-1]


def test_version_stamps_flow_into_batch():
    cfg = _make_cfg()
    runner = CodingOnlineRunner(cfg, ByteTokenizer(), TASKS)
    try:
        runner._sync_weights()
        request, futures, version = runner._submit_batch()
        result = runner._collect(request, futures, version)
        assert result.version == 1
        batch = {"loss_mask": np.ones((4, 8), bool)}
        runner._augment_batch(batch, result)
        assert float(batch["versions"][0, 0]) == 1.0
        assert float(batch["current_version"][0]) == 1.0
    finally:
        runner.server.stop()
