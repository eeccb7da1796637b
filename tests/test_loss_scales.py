"""Composable loss-scale stages (reference algorithms/loss_scales.py)."""

import numpy as np
import pytest

from rlinf_tpu.algorithms.loss_scales import apply_loss_scales


def _batch():
    # 2 trajectories: traj 0 has agents {0: turns[0,1], 1: turns[2]},
    # traj 1 has agent {0: turns[3,4]}
    return {
        "idx_to_traj": [0, 0, 0, 1, 1],
        "idx_to_sub_traj": [0, 0, 1, 0, 0],
        "advantages": np.ones(5, np.float32),
        "response_mask": np.array([
            [1, 1, 1, 0],   # 3 tokens
            [1, 0, 0, 0],   # 1 token
            [1, 1, 0, 0],   # 2 tokens
            [1, 1, 1, 1],   # 4
            [1, 1, 0, 0],   # 2
        ], bool),
    }


def test_group_level_rescales_advantages():
    ctx = {"actor_global_batch_size": 10, "data_parallel_world_size": 2}
    batch = apply_loss_scales(["group_level"], ctx, _batch())
    np.testing.assert_allclose(batch["advantages"], np.ones(5) * (5 * 2 / 10))


def test_agent_level_factors():
    ctx = {"actor_global_batch_size": 5}
    batch = apply_loss_scales(["group_level", "agent_level"], ctx, _batch())
    # traj 0: A=2 agents; agent0 T=2 -> 1/2/2; agent1 T=1 -> 1/2/1
    # traj 1: A=1; T=2 -> 1/2
    np.testing.assert_allclose(
        batch["loss_scales"], [0.25, 0.25, 0.5, 0.5, 0.5])


def test_turn_level_token_proportional():
    ctx = {"actor_global_batch_size": 5}
    batch = apply_loss_scales(
        ["group_level", "agent_level", "turn_level"], ctx, _batch())
    # traj0 agent0: tokens 3,1 of 4 -> (1/2)*(3/4), (1/2)*(1/4)
    # traj0 agent1: single turn: (1/2)*(2/2) = 1/2
    # traj1 agent0: tokens 4,2 of 6 -> (1)*(4/6), (1)*(2/6)
    np.testing.assert_allclose(
        batch["loss_scales"],
        [0.5 * 3 / 4, 0.5 * 1 / 4, 0.5, 4 / 6, 2 / 6], rtol=1e-6)


def test_ordering_contract():
    ctx = {"actor_global_batch_size": 5}
    with pytest.raises(AssertionError, match="group_level"):
        apply_loss_scales(["agent_level"], ctx, _batch())
    ctx2 = {"actor_global_batch_size": 5}
    with pytest.raises(AssertionError, match="agent_level"):
        apply_loss_scales(["group_level", "turn_level"], ctx2, _batch())
