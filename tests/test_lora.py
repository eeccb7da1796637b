"""LoRA adapters: zero-init identity, merge math, tiny-footprint PPO
training that learns while the base stays frozen (reference guides/lora.rst
capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.models.llm import LLMConfig, SamplingParams, init_params
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.lora import (
    LoRAConfig,
    init_lora_params,
    lora_num_params,
    merge_lora,
)
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.lora_learner import make_lora_policy_train_step
from rlinf_tpu.training.train_state import (
    OptimizerConfig,
    create_train_state,
    make_optimizer,
)


@pytest.fixture(scope="module")
def setup():
    cfg = LLMConfig(
        vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=128, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    base = init_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoRAConfig(enabled=True, rank=4, alpha=8.0)
    lora = init_lora_params(cfg, lcfg, jax.random.PRNGKey(1))
    return cfg, base, lcfg, lora


def test_zero_init_is_identity(setup):
    cfg, base, lcfg, lora = setup
    merged = merge_lora(base, lora, lcfg)
    ids = jnp.arange(16, dtype=jnp.int32)[None, :]
    h0, _ = M.forward_hidden(base, cfg, ids)
    h1, _ = M.forward_hidden(merged, cfg, ids)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)


def test_merge_changes_targets_only(setup):
    cfg, base, lcfg, lora = setup
    lora = jax.tree_util.tree_map(lambda x: x + 0.1, lora)
    merged = merge_lora(base, lora, lcfg)
    for name in lcfg.targets:
        assert not np.allclose(
            np.asarray(merged["blocks"][name]), np.asarray(base["blocks"][name])
        )
    np.testing.assert_array_equal(
        np.asarray(merged["embed"]), np.asarray(base["embed"])
    )
    # scaling: delta == alpha/r * a@b
    name = "wq"
    delta = np.asarray(merged["blocks"][name]) - np.asarray(base["blocks"][name])
    expect = lcfg.scaling * np.einsum(
        "lir,lro->lio",
        np.asarray(lora["blocks"][name]["a"], np.float32),
        np.asarray(lora["blocks"][name]["b"], np.float32),
    )
    np.testing.assert_allclose(delta, expect, atol=1e-5)


def test_footprint(setup):
    cfg, base, lcfg, lora = setup
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(base))
    assert lora_num_params(lora) < n_base / 5
    with pytest.raises(KeyError, match="unknown LoRA target"):
        init_lora_params(cfg, LoRAConfig(targets=("nope",)), jax.random.PRNGKey(0))


def test_lora_ppo_learns_and_base_frozen(setup):
    """GRPO-style PPO updates through merged params: reward ('a'-frequency
    analog via synthetic advantages on 'a' tokens) improves while the base
    tree is bit-identical after training."""
    cfg, base, lcfg, lora = setup
    tx = make_optimizer(OptimizerConfig(lr=5e-2, clip_grad=1.0))
    state = create_train_state(lambda r: init_lora_params(cfg, lcfg, r), tx,
                               jax.random.PRNGKey(2))
    step = make_lora_policy_train_step(
        cfg, PolicyLossConfig(), tx, lcfg, num_microbatches=2
    )

    rng = np.random.default_rng(0)
    B, T = 8, 32
    target_tok = 97  # 'a'

    def make_batch():
        ids = rng.integers(1, 258, (B, T)).astype(np.int32)
        targets = np.roll(ids, -1, axis=1)
        adv = np.where(targets == target_tok, 1.0, -0.05).astype(np.float32)
        return {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((B, T), bool),
            "target_ids": jnp.asarray(targets),
            "loss_mask": jnp.ones((B, T), bool),
            "old_logprobs": jnp.full((B, T), -np.log(258), jnp.float32),
            "advantages": jnp.asarray(adv),
        }

    base_before = jax.tree_util.tree_map(np.asarray, base)

    def mean_target_logprob(lora_params):
        merged = merge_lora(base, lora_params, lcfg)
        hidden, _ = M.forward_hidden(
            merged, cfg, jnp.asarray(rng.integers(1, 258, (2, 16)), jnp.int32)
        )
        logits = hidden @ M.lm_head_weight(merged, cfg)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return float(lp[..., target_tok].mean())

    lp0 = mean_target_logprob(state.params)
    for _ in range(15):
        state, metrics = step(state, base, make_batch())
    lp1 = mean_target_logprob(state.params)
    assert lp1 > lp0 + 0.3, f"LoRA did not learn: {lp0:.3f} -> {lp1:.3f}"
    assert np.isfinite(metrics["actor/loss"])

    for a, b in zip(
        jax.tree_util.tree_leaves(base_before),
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, base)),
    ):
        np.testing.assert_array_equal(a, b)


def test_lora_reasoning_runner_learns():
    """Full runner path with lora.enabled: GRPO on the synthetic
    char-frequency reward must improve, optimizer state is adapter-sized,
    and checkpoints hold only the adapters."""
    from rlinf_tpu.config import (
        AlgorithmConfig, RunnerConfig, TrainerConfig,
    )
    from rlinf_tpu.data.datasets import PromptDataset, PromptExample
    from rlinf_tpu.data.tokenizers import ByteTokenizer
    from rlinf_tpu.runners import ReasoningRunner

    cfg = TrainerConfig(
        model=LLMConfig(
            vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, num_kv_heads=2, max_seq_len=128, dtype="float32",
            qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(
            max_new_tokens=8, temperature=1.0, eos_token_id=-1, pad_token_id=0
        ),
        optimizer=OptimizerConfig(lr=2e-2, clip_grad=1.0),
        loss=PolicyLossConfig(clip_ratio_low=0.2, clip_ratio_high=0.2),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=30, seed=0),
        # lm_head in the target set (peft's optional lm_head target): the
        # toy model is too small for rank-4 adapters on the trunk alone to
        # move the output distribution in 30 steps.
        lora=LoRAConfig(
            enabled=True, rank=4, alpha=16.0,
            targets=("wq", "wk", "wv", "wo", "gate", "up", "down", "lm_head"),
        ),
    )
    ds = PromptDataset([PromptExample(f"q{i}:", "unused") for i in range(32)])

    def reward(texts, answers):
        return [t.count("a") / max(len(t), 1) for t in texts]

    runner = ReasoningRunner(cfg, ByteTokenizer(), ds, reward_fn=reward)
    base_before = jax.tree_util.tree_map(np.asarray, runner.base_params)
    history = runner.run(max_steps=30)
    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > first5 + 0.03, f"no LoRA learning: {first5:.4f} -> {last5:.4f}"
    # base untouched by 30 steps of training
    for a, b in zip(
        jax.tree_util.tree_leaves(base_before),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, runner.base_params)
        ),
    ):
        np.testing.assert_array_equal(a, b)
    # train state (adapters + opt) is far smaller than the model
    n_state = sum(x.size for x in jax.tree_util.tree_leaves(runner.state.params))
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(runner.base_params))
    assert n_state < n_base / 5
