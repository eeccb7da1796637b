"""Episode collection wrapper + grpo_dynamic + VQA reward."""

import numpy as np
import jax.numpy as jnp
import pytest

from rlinf_tpu.algorithms import get_advantage_fn
from rlinf_tpu.algorithms.rewards.qa_metrics import batch_vqa_rewards
from rlinf_tpu.data.replay_buffer import ReplayBuffer
from rlinf_tpu.envs.toy import PointReachEnv
from rlinf_tpu.envs.wrappers import CollectEpisodeWrapper


def test_collect_episodes_and_offline_reuse(tmp_path):
    env = CollectEpisodeWrapper(
        PointReachEnv(num_envs=4, seed=0, max_episode_steps=3),
        str(tmp_path),
    )
    env.reset()
    for _ in range(7):
        env.step(np.random.default_rng(0).uniform(-1, 1, (4, 2)).astype(np.float32))
    m = env.metrics()
    assert m["collect/episodes_written"] >= 4

    buf = ReplayBuffer(capacity=100)
    n = CollectEpisodeWrapper.load_episodes_to_buffer(str(tmp_path), buf)
    assert n == int(m["collect/episodes_written"])
    batch = buf.sample_transitions(8)
    assert batch["obs/states"].shape == (8, 4)
    assert batch["next_obs/states"].shape == (8, 4)
    assert batch["actions"].shape == (8, 2)


def test_grpo_dynamic_trajectory_mode():
    fn = get_advantage_fn("grpo_dynamic")
    # 2 questions x 2 trajectories; traj 0 has 1 turn, traj 1 has 2 turns, ...
    idx_to_traj = [0, 1, 1, 2, 3, 3]
    rewards = jnp.asarray([1.0, 0.0, 0.0, 2.0, 4.0, 4.0])
    loss_mask = jnp.ones((3, 6))
    adv, _ = fn(
        rewards=rewards, loss_mask=loss_mask, group_size=2,
        idx_to_traj=idx_to_traj, advantage_mode="trajectory",
    )
    adv = np.asarray(adv)
    # Q0: traj rewards [1, 0] -> normalized [+x, -x]; turns of traj 1 share adv
    assert adv[0, 0] > 0 and adv[0, 1] < 0
    np.testing.assert_allclose(adv[0, 1], adv[0, 2], rtol=1e-6)
    # Q1: traj rewards [2, 4] -> traj2 negative, traj3 positive
    assert adv[0, 3] < 0 and adv[0, 4] > 0


def test_grpo_dynamic_turn_mode():
    fn = get_advantage_fn("grpo_dynamic")
    idx_to_traj = [0, 0, 1, 1]  # 1 question, 2 trajs, 2 turns each
    rewards = jnp.asarray([1.0, 3.0, 2.0, 2.0])
    loss_mask = jnp.ones((2, 4))
    adv, _ = fn(
        rewards=rewards, loss_mask=loss_mask, group_size=2,
        idx_to_traj=idx_to_traj, advantage_mode="turn",
    )
    adv = np.asarray(adv)
    # whitened over the 4 turns of the question: mean 2, ddof-1 std
    std = np.std([1, 3, 2, 2], ddof=1)
    np.testing.assert_allclose(adv[0], (np.array([1, 3, 2, 2]) - 2) / (std + 1e-6),
                               rtol=1e-4)


def test_vqa_reward():
    out = batch_vqa_rewards(
        ["thinking <answer>a dog</answer>"],
        [["dog", "a dog", "the dog", "puppy"]],
    )
    # matches 'a dog' exactly after normalization vs 3 of 4 annotator answers
    assert out[0] == 1.0
    assert batch_vqa_rewards(["<answer>cat</answer>"], [["dog"] * 4]) == [0.0]
