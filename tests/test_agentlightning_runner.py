"""AgentLightning-style external-agent training (VERDICT r3 missing #7).

Reference analog: rlinf/runners/agentlightning_runner.py — a user's own
agent framework drives the LLM endpoint; its span-recorded completions are
trained on with GRPO. The "external framework" here is a plain Python
two-step agent (call -> reflect -> self-scored reward).
"""

import numpy as np

from rlinf_tpu.config import AlgorithmConfig, RunnerConfig, TrainerConfig
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.runners.agentlightning_runner import AgentLightningRunner
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.train_state import OptimizerConfig


def _cfg(**overrides):
    base = dict(
        model=LLMConfig(
            vocab_size=258, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, num_kv_heads=2, max_seq_len=256,
            dtype="float32", qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(
            max_new_tokens=8, temperature=1.0, eos_token_id=-1,
            pad_token_id=0,
        ),
        optimizer=OptimizerConfig(lr=5e-3, clip_grad=1.0),
        loss=PolicyLossConfig(clip_ratio_low=0.2, clip_ratio_high=0.2),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=4, max_steps=30, seed=0),
    )
    base.update(overrides)
    return TrainerConfig(**base)


DATASET = PromptDataset(
    [PromptExample(f"task {i}:", "unused") for i in range(8)]
)


def _digit_frac(t):
    return sum(c.isdigit() for c in t) / max(len(t), 1)


def test_external_agent_learns():
    """Two-call external agent that scores its own spans: GRPO on the
    recorded rollouts must raise the agent-computed reward."""

    def agent_fn(complete, task):
        first = complete(task.prompt)
        second = complete(f"reflect on {first[:8]}:")
        return 0.5 * _digit_frac(first) + 0.5 * _digit_frac(second)

    runner = AgentLightningRunner(
        _cfg(), ByteTokenizer(), DATASET, agent_fn, max_total_len=128,
    )
    hist = runner.run(max_steps=20)
    assert all(h["agent/external_reward_rate"] == 1.0 for h in hist)
    assert all(h["agent/llm_calls_mean"] == 2.0 for h in hist)
    first5 = np.mean([h["agent/reward_mean"] for h in hist[:5]])
    last5 = np.mean([h["agent/reward_mean"] for h in hist[-5:]])
    assert last5 > first5 + 0.03, f"no learning: {first5:.4f} -> {last5:.4f}"


def test_reward_fillna_and_fallback():
    """Agents that return None fall back to reward_fn, then to the fillna
    value (reference reward_fillna_value semantics)."""

    def agent_fn(complete, task):
        complete(task.prompt)
        return None

    calls = {"n": 0}

    def reward_fn(texts, answers):
        calls["n"] += len(texts)
        return [0.25] * len(texts)

    runner = AgentLightningRunner(
        _cfg(), ByteTokenizer(), DATASET, agent_fn,
        reward_fn=reward_fn, max_total_len=64,
    )
    out = runner.run_step()
    assert calls["n"] == 4 * 8
    assert out["agent/reward_mean"] == 0.25
    assert out["agent/external_reward_rate"] == 0.0

    runner2 = AgentLightningRunner(
        _cfg(), ByteTokenizer(), DATASET, agent_fn,
        reward_fillna_value=0.75, max_total_len=64,
    )
    out2 = runner2.run_step()
    assert out2["agent/reward_mean"] == 0.75
