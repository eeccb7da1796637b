"""SFT runner learns; dynamic token-budget packing preserves gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.config import (
    AlgorithmConfig,
    RunnerConfig,
    TrainerConfig,
)
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.dynamic_batching import best_fit_decreasing, pack_microbatches
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.runners.sft_runner import SFTRunner
from rlinf_tpu.runners.reasoning_runner import ReasoningRunner
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.train_state import OptimizerConfig


def _tiny_model():
    return LLMConfig(
        vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=128, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )


def test_sft_loss_decreases():
    cfg = TrainerConfig(
        model=_tiny_model(),
        optimizer=OptimizerConfig(lr=5e-3),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=30),
        algorithm=AlgorithmConfig(group_size=2),
    )
    data = PromptDataset(
        [PromptExample(f"q{i}:", "the answer is 42") for i in range(16)]
    )
    runner = SFTRunner(cfg, ByteTokenizer(), data)
    hist = runner.run(max_steps=25)
    first = np.mean([h["sft/loss"] for h in hist[:3]])
    last = np.mean([h["sft/loss"] for h in hist[-3:]])
    assert last < first * 0.5, f"SFT not learning: {first:.3f} -> {last:.3f}"
    assert hist[-1]["sft/ppl"] < hist[0]["sft/ppl"]


def test_best_fit_decreasing_budget():
    lengths = [100, 90, 50, 40, 30, 10, 200]
    bins = best_fit_decreasing(lengths, 120)
    covered = sorted(i for b in bins for i in b)
    assert covered == list(range(7))
    for b in bins:
        total = sum(lengths[i] for i in b)
        assert total <= 120 or len(b) == 1  # oversized rows go alone
    # 200 must be alone
    assert any(b == [6] for b in bins)


def test_pack_microbatches_shapes():
    rng = np.random.default_rng(0)
    B, T = 10, 256
    lengths = rng.integers(10, 250, B)
    mask = np.zeros((B, T), bool)
    for i, L in enumerate(lengths):
        mask[i, :L] = True
    batch = {
        "attention_mask": mask,
        "input_ids": rng.integers(0, 100, (B, T)).astype(np.int32),
        "loss_mask": mask.copy(),
    }
    mbs = pack_microbatches(batch, lengths, max_tokens=300, seq_bucket=64)
    # every row appears exactly once (padding rows have empty masks)
    total_valid = sum(int(m["attention_mask"].sum()) for m in mbs)
    assert total_valid == int(mask.sum())
    for m in mbs:
        rows, t = m["attention_mask"].shape
        assert rows & (rows - 1) == 0          # power-of-two rows
        assert t % 64 == 0 or t == T           # bucketed seq len
        assert m["attention_mask"].sum(-1).max() <= t


def test_dynamic_batching_grpo_matches_static():
    """One runner step with dynamic packing must produce (nearly) the same
    params as the static path: same data, same seeds, global normalization."""
    data = PromptDataset([PromptExample(f"word {i}", "x") for i in range(32)])
    reward = lambda texts, answers: [float(len(t)) / 8 for t in texts]

    def build(max_tokens):
        cfg = TrainerConfig(
            model=_tiny_model(),
            sampling=SamplingParams(max_new_tokens=8, eos_token_id=-1),
            optimizer=OptimizerConfig(lr=1e-3),
            loss=PolicyLossConfig(max_tokens_per_mb=max_tokens),
            algorithm=AlgorithmConfig(adv_type="grpo", group_size=4),
            runner=RunnerConfig(rollout_batch_size=8, seed=0),
        )
        return ReasoningRunner(cfg, ByteTokenizer(), data, reward_fn=reward)

    r_static = build(0)
    r_dynamic = build(48)  # force multiple packed microbatches
    out_s = r_static.run_step()
    out_d = r_dynamic.run_step()
    assert out_d["actor/num_dyn_microbatches"] >= 2
    for a, b in zip(
        jax.tree_util.tree_leaves(r_static.state.params),
        jax.tree_util.tree_leaves(r_dynamic.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
