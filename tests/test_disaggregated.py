"""Disaggregated placement driven end-to-end on the 8-device CPU mesh.

VERDICT round-1 item 5: learner and rollout on disjoint submeshes,
generation overlapped with training, weights synced through
parallel/weight_sync.py with version stamps + decoupled-PPO loss.
Curve parity bar: the disaggregated run must LEARN the same synthetic
reward the collocated e2e test learns (tests/test_e2e_reasoning.py).
"""

import jax
import numpy as np
import pytest

from rlinf_tpu.config import (
    AlgorithmConfig, RolloutConfig, RunnerConfig, TrainerConfig,
)
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.parallel.mesh import ComponentPlacement, PlacementMode
from rlinf_tpu.runners.disaggregated_runner import DisaggregatedReasoningRunner
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.train_state import OptimizerConfig


def _char_reward(texts, answers):
    return [
        (sum(c == "a" for c in t) / max(len(t), 1)) if t else 0.0
        for t in texts
    ]


def _cfg(**kw):
    base = dict(
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
        loss=PolicyLossConfig(loss_type="decoupled"),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=30, seed=0),
    )
    base.update(kw)
    return TrainerConfig(**base)


@pytest.fixture(scope="module")
def dataset():
    return PromptDataset(
        [PromptExample(f"question {i}:", "unused") for i in range(32)]
    )


@pytest.fixture(scope="module")
def placement(devices):
    p = ComponentPlacement(components={"actor": "0-3", "rollout": "4-7"})
    assert p.mode == PlacementMode.DISAGGREGATED
    return p


def test_rejects_collocated_placement(dataset):
    p = ComponentPlacement(components={"actor": "0-7", "rollout": "0-7"})
    with pytest.raises(ValueError, match="DISAGGREGATED"):
        DisaggregatedReasoningRunner(
            _cfg(), ByteTokenizer(), dataset, placement=p,
            reward_fn=_char_reward,
        )


def test_rejects_plain_ppo_loss(dataset, placement):
    with pytest.raises(ValueError, match="decoupled"):
        DisaggregatedReasoningRunner(
            _cfg(loss=PolicyLossConfig(loss_type="ppo")),
            ByteTokenizer(), dataset, placement=placement,
            reward_fn=_char_reward,
        )


@pytest.mark.parametrize("syncer", ["bucket", "patch"])
def test_disaggregated_learns(dataset, placement, syncer):
    runner = DisaggregatedReasoningRunner(
        _cfg(), ByteTokenizer(), dataset, placement=placement,
        reward_fn=_char_reward, syncer=syncer,
    )
    # train state on the actor submesh, rollout params on the rollout submesh
    actor_devs = set(placement.mesh("actor").devices.flatten())
    rollout_devs = set(placement.mesh("rollout").devices.flatten())
    p_leaf = jax.tree_util.tree_leaves(runner.state.params)[0]
    r_leaf = jax.tree_util.tree_leaves(runner.rollout_params)[0]
    assert set(p_leaf.devices()) <= actor_devs
    assert set(r_leaf.devices()) <= rollout_devs

    history = runner.run(max_steps=30)
    assert runner.param_version >= 29  # sync_interval=1 -> one sync per step
    lags = [h["disagg/version_lag"] for h in history[2:]]
    assert max(lags) >= 1.0  # overlap => training sees stale rollouts

    first5 = np.mean([h["rollout/reward_mean"] for h in history[:5]])
    last5 = np.mean([h["rollout/reward_mean"] for h in history[-5:]])
    assert last5 > first5 + 0.05, f"no learning: {first5:.4f} -> {last5:.4f}"


def test_sync_interval_batches_syncs(dataset, placement):
    runner = DisaggregatedReasoningRunner(
        _cfg(), ByteTokenizer(), dataset, placement=placement,
        reward_fn=_char_reward, sync_interval=4,
    )
    history = runner.run(max_steps=8)
    assert runner.param_version == 2
    assert max(h["disagg/version_lag"] for h in history) <= 2.0
