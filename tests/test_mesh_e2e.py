"""Full GRPO runner on a multi-chip mesh (dp x tp over 8 virtual devices)."""

import numpy as np
import jax
import pytest

from rlinf_tpu.config import (
    AlgorithmConfig, RunnerConfig, TrainerConfig,
)
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.parallel import MeshConfig, make_mesh
from rlinf_tpu.runners.reasoning_runner import ReasoningRunner
from rlinf_tpu.training.train_state import OptimizerConfig


def _reward(texts, answers):
    return [sum(c == "a" for c in t) / max(len(t), 1) for t in texts]


def test_grpo_runner_on_dp_tp_mesh(devices):
    mesh = make_mesh(MeshConfig(data=-1, tensor=2))
    cfg = TrainerConfig(
        model=LLMConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, num_kv_heads=2, max_seq_len=128, dtype="float32",
            qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(max_new_tokens=8, eos_token_id=-1),
        optimizer=OptimizerConfig(lr=5e-3),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=10, seed=0),
    )
    dataset = PromptDataset([PromptExample(f"q{i}:", "x") for i in range(16)])
    with jax.set_mesh(mesh):
        runner = ReasoningRunner(
            cfg, ByteTokenizer(), dataset, mesh=mesh, reward_fn=_reward
        )
        # params sharded: embed [256, 32] over (tensor, fsdp) -> 128 rows/shard
        emb = runner.state.params["embed"]
        assert emb.addressable_shards[0].data.shape[0] == 128
        hist = runner.run(max_steps=8)
    first = np.mean([h["rollout/reward_mean"] for h in hist[:3]])
    last = np.mean([h["rollout/reward_mean"] for h in hist[-3:]])
    assert last > first, f"no improvement on mesh: {first} -> {last}"
    assert np.isfinite(hist[-1]["actor/loss"])


def test_grpo_runner_mesh_matches_single_device(devices):
    """Same seed, mesh vs no mesh: rollout+training must agree numerically
    (single-program SPMD determinism)."""
    def build(mesh):
        cfg = TrainerConfig(
            model=LLMConfig(
                vocab_size=256, hidden_size=32, intermediate_size=64,
                num_layers=1, num_heads=2, num_kv_heads=2, max_seq_len=64,
                dtype="float32", qkv_bias=False, rope_theta=1e4,
            ),
            sampling=SamplingParams(max_new_tokens=4, eos_token_id=-1),
            optimizer=OptimizerConfig(lr=1e-3),
            algorithm=AlgorithmConfig(adv_type="grpo", group_size=4),
            runner=RunnerConfig(rollout_batch_size=4, max_steps=2, seed=0),
        )
        data = PromptDataset([PromptExample(f"q{i}:", "x") for i in range(8)])
        return ReasoningRunner(
            cfg, ByteTokenizer(), data, mesh=mesh, reward_fn=_reward
        )

    r_single = build(None)
    out_single = r_single.run_step()

    mesh = make_mesh(MeshConfig(data=-1))
    with jax.set_mesh(mesh):
        r_mesh = build(mesh)
        out_mesh = r_mesh.run_step()

    # same rollout => same reward; same update => same loss (fp32, dp-only)
    assert out_single["rollout/reward_mean"] == pytest.approx(
        out_mesh["rollout/reward_mean"], abs=1e-6
    )
    assert out_single["actor/loss"] == pytest.approx(
        out_mesh["actor/loss"], rel=1e-4, abs=1e-6
    )
