"""Offline RL: IQL + BC must learn from a stored dataset (no env)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.data.replay_buffer import ReplayBuffer
from rlinf_tpu.envs.toy import BanditEnv
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.runners.offline_runner import OfflineRunner, OfflineRunnerConfig
from rlinf_tpu.training.iql_learner import IQLConfig, expectile_loss


def _make_bandit_dataset(n_items=20, per_item=128, noise=0.3, seed=0):
    """Bandit transitions from a noisy near-expert: action = target + noise.
    Reward reveals quality, so IQL's advantage weighting should recover the
    expert while BC learns the noisy mean."""
    rng = np.random.default_rng(seed)
    buf = ReplayBuffer(capacity=n_items + 1, seed=seed)
    for _ in range(n_items):
        target = rng.uniform(-0.5, 0.5, (per_item, 2)).astype(np.float32)
        action = np.clip(
            target + rng.normal(0, noise, (per_item, 2)), -0.999, 0.999
        ).astype(np.float32)
        reward = -np.sum((action - target) ** 2, axis=-1).astype(np.float32)
        buf.add({
            "obs/states": target,
            "next_obs/states": target,
            "actions": action,
            "rewards": reward,
            "dones": np.ones(per_item, np.float32),
        })
    return buf


def test_expectile_loss():
    d = jnp.asarray([1.0, -1.0])
    out = np.asarray(expectile_loss(d, 0.9))
    np.testing.assert_allclose(out, [0.9, 0.1], rtol=1e-6)


def test_bc_learns_dataset_mean():
    buf = _make_bandit_dataset()
    policy = MLPSACPolicy(obs_dim=2, action_dim=2, hidden_sizes=(64, 64))
    runner = OfflineRunner(
        OfflineRunnerConfig(algorithm="bc", max_steps=400, batch_size=256,
                            log_interval=200),
        buf, policy,
    )
    runner.run()
    obs = {"states": jnp.asarray([[0.3, -0.2]], jnp.float32)}
    act = np.asarray(
        policy.predict_action_batch(
            runner.state.params, jax.random.PRNGKey(0), obs, deterministic=True
        ).actions
    )
    np.testing.assert_allclose(act[0], [0.3, -0.2], atol=0.15)


def test_iql_learns_and_sharpens_over_bc():
    buf = _make_bandit_dataset(noise=0.4)
    policy = MLPSACPolicy(obs_dim=2, action_dim=2, hidden_sizes=(64, 64))
    runner = OfflineRunner(
        OfflineRunnerConfig(algorithm="iql", max_steps=600, batch_size=256,
                            log_interval=300),
        buf, policy,
        iql=IQLConfig(gamma=0.0, expectile=0.8, beta=5.0),
    )
    out = runner.run()
    for k in ["iql/v_loss", "iql/q_loss", "iql/actor_loss"]:
        assert np.isfinite(out[k])
    rng = np.random.default_rng(42)
    targets = rng.uniform(-0.5, 0.5, (256, 2)).astype(np.float32)
    act = np.asarray(
        policy.predict_action_batch(
            runner.state.params, jax.random.PRNGKey(0),
            {"states": jnp.asarray(targets)}, deterministic=True,
        ).actions
    )
    err = np.sqrt(((act - targets) ** 2).sum(-1)).mean()
    # the noisy behavior policy has ~0.4*sqrt(2)=0.57 error; IQL must beat it
    assert err < 0.35, f"IQL action error too high: {err:.3f}"
