"""SAC policy/learner units + async actor-learner end-to-end learning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.envs.toy import BanditEnv, PointReachEnv
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.runners.async_embodied_runner import (
    AsyncEmbodiedRunner,
    AsyncRunnerConfig,
)
from rlinf_tpu.training.sac_learner import SACConfig, make_sac_train_step
from rlinf_tpu.training.train_state import (
    OptimizerConfig,
    create_train_state,
    make_optimizer,
)


def test_sac_policy_logprob_consistency():
    policy = MLPSACPolicy(obs_dim=4, action_dim=2)
    params = policy.init(jax.random.PRNGKey(0))
    obs = {"states": jnp.asarray(np.random.default_rng(0).normal(size=(5, 4)), jnp.float32)}
    a, lp = policy.sample_action(params, jax.random.PRNGKey(1), obs)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)
    fwd = policy.default_forward(params, obs, a)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(fwd["logprobs"]), rtol=1e-3, atol=1e-3
    )


def test_sac_train_step_updates_and_polyak():
    policy = MLPSACPolicy(obs_dim=3, action_dim=2, hidden_sizes=(32, 32))
    tx = make_optimizer(OptimizerConfig(lr=1e-3, clip_grad=0.0))
    state = create_train_state(policy.init, tx, jax.random.PRNGKey(0))
    step_fn = make_sac_train_step(policy, SACConfig(tau=0.01), tx)

    rng = np.random.default_rng(0)
    N = 32
    batch = {
        "obs/states": jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
        "next_obs/states": jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
        "actions": jnp.asarray(np.tanh(rng.normal(size=(N, 2))), jnp.float32),
        "rewards": jnp.asarray(rng.normal(size=(N,)), jnp.float32),
        "dones": jnp.zeros((N,), jnp.float32),
    }
    q1_before = np.asarray(state.params["q1"][0]["w"]).copy()
    t_before = np.asarray(state.params["q1_target"][0]["w"]).copy()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    q1_after = np.asarray(state.params["q1"][0]["w"])
    t_after = np.asarray(state.params["q1_target"][0]["w"])

    assert not np.allclose(q1_before, q1_after)          # critics train
    assert not np.allclose(t_before, t_after)            # targets move...
    # ...but only by the polyak fraction
    assert np.abs(t_after - t_before).max() < np.abs(q1_after - q1_before).max()
    for k in ["sac/critic_loss", "sac/actor_loss", "sac/alpha", "sac/entropy"]:
        assert np.isfinite(float(metrics[k])), k


def test_async_sac_learns_bandit():
    """Async actor-learner must drive the 1-step bandit reward toward 0."""
    policy = MLPSACPolicy(obs_dim=2, action_dim=2, hidden_sizes=(64, 64))
    runner = AsyncEmbodiedRunner(
        AsyncRunnerConfig(
            total_train_steps=450,
            rollout_chunk_steps=4,
            train_batch_size=128,
            warmup_transitions=256,
            weight_sync_interval=5,
            updates_per_chunk=4.0,
            replay_capacity=200,
            seed=0,
            log_interval=100,
        ),
        envs=[BanditEnv(num_envs=32, seed=0)],
        policy=policy,
        sac=SACConfig(gamma=0.0, learn_alpha=True),  # bandit: no bootstrap
    )
    runner.run()
    assert runner.param_version > 0
    assert runner.buffer.total_transitions > 0
    out = runner.evaluate(BanditEnv(num_envs=64, seed=123), num_steps=4)
    # eval metrics exist; policy reward measured directly:
    env = BanditEnv(num_envs=256, seed=7)
    obs = env.reset()
    a = np.asarray(
        policy.predict_action_batch(
            runner.state.params, jax.random.PRNGKey(0),
            {"states": jnp.asarray(obs["states"])}, deterministic=True,
        ).actions
    )
    reward = -np.sum((a - obs["states"]) ** 2, axis=-1).mean()
    assert reward > -0.1, f"SAC failed to learn bandit: {reward:.4f}"


def test_async_ppo_learns_point_reach():
    """Async decoupled PPO: continuous rollout + version-lag-corrected
    updates must raise success_once."""
    from rlinf_tpu.envs.toy import PointReachEnv
    from rlinf_tpu.models.embodiment import MLPGaussianPolicy
    from rlinf_tpu.runners.async_ppo_runner import AsyncPPOConfig, AsyncPPORunner

    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2, init_logstd=-0.5)
    runner = AsyncPPORunner(
        AsyncPPOConfig(
            total_train_steps=40, rollout_chunk_steps=16,
            num_epochs=2, num_mini_batches=4, gamma=0.9,
            weight_sync_interval=1, seed=0, log_interval=20,
        ),
        envs=[PointReachEnv(num_envs=64, seed=0, max_episode_steps=16)],
        policy=policy,
        optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
    )
    hist = runner.run(max_steps=40)
    early = np.mean([h.get("env/success_once", 0.0) for h in hist[:5]])
    late = np.mean([h.get("env/success_once", 0.0) for h in hist[-5:]])
    assert late > max(2 * early, 0.3), f"async PPO: {early:.3f} -> {late:.3f}"
    assert all(h["async/version_lag"] >= 1.0 for h in hist[1:])
