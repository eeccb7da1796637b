"""End-to-end GRPO: a tiny random-init model must LEARN a synthetic reward.

The TPU analog of the reference's parity tests (tests/parity_tests/): run real
training for a few steps and assert the learning signal moves, not just that
code executes.
"""

import numpy as np
import pytest

from rlinf_tpu.config import TrainerConfig, config_from_dict, load_config
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.runners.reasoning_runner import ReasoningRunner
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.train_state import OptimizerConfig
from rlinf_tpu.config import AlgorithmConfig, DataConfig, RunnerConfig


def _char_frequency_reward(texts, answers):
    """Dense synthetic reward: fraction of chars equal to 'a'."""
    return [
        (sum(c == "a" for c in t) / max(len(t), 1)) if t else 0.0 for t in texts
    ]


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
        loss=PolicyLossConfig(clip_ratio_low=0.2, clip_ratio_high=0.2),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=30, seed=0),
    )
    base.update(overrides)
    return TrainerConfig(**base)


@pytest.fixture(scope="module")
def toy_dataset():
    return PromptDataset(
        [PromptExample(f"question {i}:", "unused") for i in range(32)]
    )


def test_grpo_learns_synthetic_reward(toy_dataset):
    cfg = _make_cfg()
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), toy_dataset, reward_fn=_char_frequency_reward
    )
    history = runner.run(max_steps=25)
    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    # Random init: ~1/258 of tokens are 'a' (<1.5%). GRPO must push this up.
    assert last5 > first5 + 0.05, f"no learning: {first5:.4f} -> {last5:.4f}"
    assert last5 > 3 * max(first5, 1e-3)


def test_runner_metrics_and_masks(toy_dataset):
    cfg = _make_cfg()
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), toy_dataset, reward_fn=_char_frequency_reward
    )
    out = runner.run_step()
    for key in [
        "actor/loss", "actor/grad_norm", "actor/approx_kl", "actor/entropy",
        "rollout/reward_mean", "rollout/response_len_mean", "time/rollout",
        "time/training",
    ]:
        assert key in out, f"missing metric {key}"
    assert out["rollout/response_len_mean"] == 8.0  # no eos => full length
    # Logprob-consistency invariant (VERDICT round-2): at step 1 the PPO
    # ratio anchor must BE the rollout policy — approx_kl ≈ 0. A violation
    # means the engine's behavior logprobs came from a different computation
    # than the training path and weren't recomputed.
    assert abs(out["actor/approx_kl"]) < 1e-3, (
        f"step-1 approx_kl {out['actor/approx_kl']} — rollout/training "
        "logprob paths disagree"
    )


def test_checkpoint_resume(tmp_path, toy_dataset):
    cfg = _make_cfg(
        runner=RunnerConfig(
            rollout_batch_size=8, max_steps=4, seed=0,
            checkpoint_dir=str(tmp_path / "ckpt"), save_interval=2,
        ),
    )
    r1 = ReasoningRunner(
        cfg, ByteTokenizer(), toy_dataset, reward_fn=_char_frequency_reward
    )
    r1.run(max_steps=2)
    params_after_2 = r1.state.params

    # New runner resumes from step 2
    r2 = ReasoningRunner(
        cfg, ByteTokenizer(), toy_dataset, reward_fn=_char_frequency_reward
    )
    assert r2.global_step == 2
    assert r2.iterator.state_dict() == r1.iterator.state_dict()
    leaves1 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(params_after_2)]
    leaves2 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(r2.state.params)]
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)


def test_config_yaml_roundtrip(tmp_path):
    import yaml

    path = tmp_path / "cfg.yaml"
    path.write_text(
        yaml.safe_dump(
            {
                "model": {"hidden_size": 32, "num_layers": 1, "num_heads": 2,
                          "num_kv_heads": 2, "vocab_size": 128,
                          "intermediate_size": 64},
                "runner": {"rollout_batch_size": 4},
                "algorithm": {"group_size": 4},
            }
        )
    )
    cfg = load_config(str(path), overrides=["optimizer.lr=3e-4", "runner.max_steps=7"])
    assert cfg.model.hidden_size == 32
    assert cfg.optimizer.lr == 3e-4
    assert cfg.runner.max_steps == 7

    with pytest.raises(ValueError, match="Unknown keys"):
        config_from_dict({"model": {"bogus_field": 1}})


def test_ppo_with_critic_learns(toy_dataset):
    """GAE + learned value head (actor-critic) must also learn the synthetic
    reward — exercises the MegatronCritic-analog path."""
    from rlinf_tpu.config import AlgorithmConfig, RunnerConfig

    cfg = _make_cfg(
        algorithm=AlgorithmConfig(
            adv_type="gae", group_size=4, gamma=1.0, gae_lambda=0.95
        ),
        runner=RunnerConfig(rollout_batch_size=16, max_steps=30, seed=0),
    )
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), toy_dataset, reward_fn=_char_frequency_reward
    )
    assert runner.with_critic
    assert "value_head" in runner.state.params
    history = runner.run(max_steps=25)
    for key in ["critic/value_loss", "critic/explained_variance"]:
        assert key in history[-1]
    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > first5 + 0.03, f"no learning: {first5:.4f} -> {last5:.4f}"


def test_pipelined_mode_learns(toy_dataset):
    """run_pipelined (rollout/training overlap) must also learn."""
    cfg = _make_cfg()
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), toy_dataset, reward_fn=_char_frequency_reward
    )
    history = runner.run_pipelined(max_steps=25)
    assert len(history) == 25
    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > 3 * max(first5, 1e-3), f"pipelined no learning: {first5} -> {last5}"


def test_separate_critic_ppo_learns(toy_dataset):
    """algorithm.critic='separate': dedicated critic model + optimizer +
    warmup (reference MegatronCritic path). The separate critic's explained
    variance must rise and the policy must still learn."""
    from rlinf_tpu.config import AlgorithmConfig, RunnerConfig

    cfg = _make_cfg(
        algorithm=AlgorithmConfig(
            adv_type="gae", group_size=4, gamma=1.0, gae_lambda=0.95,
            critic="separate", critic_warmup_steps=2, critic_lr=1e-2,
        ),
        runner=RunnerConfig(rollout_batch_size=16, max_steps=30, seed=0),
    )
    runner = ReasoningRunner(
        cfg, ByteTokenizer(), toy_dataset, reward_fn=_char_frequency_reward
    )
    assert runner.separate_critic
    # actor has no value head; the critic tree does
    assert "value_head" not in runner.state.params
    assert "value_head" in runner.critic_state.params
    history = runner.run(max_steps=28)
    # warmup steps skip actor updates
    assert history[0].get("actor/warmup_skipped") == 1.0
    assert "actor/loss" not in history[0]
    assert "actor/loss" in history[-1]
    ev_early = np.mean([h["critic/explained_variance"] for h in history[2:6]])
    ev_late = np.mean([h["critic/explained_variance"] for h in history[-4:]])
    assert ev_late > ev_early, f"critic not improving: {ev_early} -> {ev_late}"
    first5 = np.mean([h["rollout/reward_mean"] for h in history[2:7]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > first5 + 0.02, f"no learning: {first5:.4f} -> {last5:.4f}"


def test_separate_critic_requires_gae():
    from rlinf_tpu.config import config_from_dict
    import pytest as _pytest

    with _pytest.raises(ValueError, match="separate"):
        config_from_dict({
            "model": {"max_seq_len": 512},
            "algorithm": {"adv_type": "grpo", "critic": "separate"},
        })
