"""Engine selection through the runner (reference rollout.backend choice).

VERDICT round-1 item 2: the fast engines must be wired into the actual
training path, not just unit-tested standalone. These tests drive
ReasoningRunner end-to-end through each engine and assert the learning
signal moves (the parity-test bar of tests/test_e2e_reasoning.py).
"""

import numpy as np
import pytest

from rlinf_tpu.config import (
    AlgorithmConfig, RolloutConfig, RunnerConfig, TrainerConfig,
)
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.rollout import build_rollout_engine
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine
from rlinf_tpu.rollout.engine import RolloutEngine
from rlinf_tpu.rollout.paged_engine import PagedContinuousEngine
from rlinf_tpu.runners.reasoning_runner import ReasoningRunner
from rlinf_tpu.training.train_state import OptimizerConfig


def _char_reward(texts, answers):
    return [
        (sum(c == "a" for c in t) / max(len(t), 1)) if t else 0.0
        for t in texts
    ]


def _cfg(engine: str, **rollout_kw) -> TrainerConfig:
    return TrainerConfig(
        model=LLMConfig(
            vocab_size=258, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, num_kv_heads=2, max_seq_len=128,
            dtype="float32", qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(
            max_new_tokens=8, temperature=1.0, eos_token_id=-1,
            pad_token_id=0,
        ),
        optimizer=OptimizerConfig(lr=5e-3, clip_grad=1.0),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=30, seed=0),
        rollout=RolloutConfig(
            engine=engine, num_slots=16, decode_chunk=4, prompt_bucket=16,
            **rollout_kw,
        ),
    )


@pytest.fixture(scope="module")
def dataset():
    return PromptDataset(
        [PromptExample(f"question {i}:", "unused") for i in range(32)]
    )


def test_auto_resolves_to_continuous_without_mesh():
    eng = build_rollout_engine(_cfg("auto"))
    assert isinstance(eng, ContinuousBatchingEngine)
    assert not isinstance(eng, PagedContinuousEngine)


def test_auto_resolves_to_static_with_mesh(devices):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    eng = build_rollout_engine(_cfg("auto"), mesh=mesh)
    assert isinstance(eng, RolloutEngine)


def test_build_each_engine():
    assert isinstance(build_rollout_engine(_cfg("static")), RolloutEngine)
    assert isinstance(
        build_rollout_engine(_cfg("continuous")), ContinuousBatchingEngine
    )
    assert isinstance(
        build_rollout_engine(_cfg("paged", page_size=16)),
        PagedContinuousEngine,
    )


def test_runner_learns_on_paged_engine(dataset):
    cfg = _cfg("paged", page_size=16)
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), dataset, reward_fn=_char_reward
    )
    assert isinstance(runner.engine, PagedContinuousEngine)
    history = runner.run(max_steps=25)
    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > first5 + 0.05, f"no learning: {first5:.4f} -> {last5:.4f}"


def test_runner_learns_on_continuous_engine(dataset):
    cfg = _cfg("continuous")
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), dataset, reward_fn=_char_reward
    )
    assert isinstance(runner.engine, ContinuousBatchingEngine)
    history = runner.run(max_steps=25)
    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > first5 + 0.05, f"no learning: {first5:.4f} -> {last5:.4f}"


def test_static_engine_still_works(dataset):
    cfg = _cfg("static")
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), dataset, reward_fn=_char_reward
    )
    assert isinstance(runner.engine, RolloutEngine)
    out = runner.run_step()
    assert "rollout/reward_mean" in out
