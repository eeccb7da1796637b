"""Embodied PPO end-to-end: learning on toy envs + policy/env unit checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.envs import get_env_cls
from rlinf_tpu.envs.toy import BanditEnv, PointReachEnv
from rlinf_tpu.models.embodiment import CNNGaussianPolicy, MLPGaussianPolicy
from rlinf_tpu.runners.embodied_runner import EmbodiedRunner, EmbodiedRunnerConfig
from rlinf_tpu.training.train_state import OptimizerConfig
from rlinf_tpu.training.embodied_learner import EmbodiedLossConfig


def test_env_registry():
    assert get_env_cls("point_reach") is PointReachEnv
    with pytest.raises(KeyError):
        get_env_cls("nope")


def test_point_reach_env_contract():
    env = PointReachEnv(num_envs=8, seed=0, max_episode_steps=5)
    obs = env.reset()
    assert obs["states"].shape == (8, 4)
    for _ in range(5):
        out = env.step(np.zeros((8, 2), np.float32))
    # every env has finished at least one episode within max_episode_steps
    # (truncation at 5, possibly earlier success); auto-reset makes obs fresh
    m = env.metrics()
    assert m["env/num_episodes"] >= 8
    assert out.obs["states"].shape == (8, 4)


def test_mlp_policy_forward_consistency():
    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2)
    params = policy.init(jax.random.PRNGKey(0))
    obs = {"states": jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)), jnp.float32)}
    out = policy.predict_action_batch(params, jax.random.PRNGKey(1), obs)
    fwd = policy.default_forward(params, obs, out.actions)
    np.testing.assert_allclose(
        np.asarray(out.logprobs), np.asarray(fwd["logprobs"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.values), np.asarray(fwd["values"]), rtol=1e-5
    )
    # deterministic mode returns the mean
    det = policy.predict_action_batch(
        params, jax.random.PRNGKey(2), obs, deterministic=True
    )
    det2 = policy.predict_action_batch(
        params, jax.random.PRNGKey(3), obs, deterministic=True
    )
    np.testing.assert_array_equal(np.asarray(det.actions), np.asarray(det2.actions))


def test_cnn_policy_shapes():
    policy = CNNGaussianPolicy(image_shape=(36, 36, 3), action_dim=4, proprio_dim=5)
    params = policy.init(jax.random.PRNGKey(0))
    obs = {
        "images": jnp.zeros((2, 36, 36, 3), jnp.uint8),
        "states": jnp.zeros((2, 5), jnp.float32),
    }
    out = policy.predict_action_batch(params, jax.random.PRNGKey(1), obs)
    assert out.actions.shape == (2, 4)
    assert out.values.shape == (2,)


def test_ppo_learns_bandit():
    envs = [BanditEnv(num_envs=64, seed=0)]
    policy = MLPGaussianPolicy(obs_dim=2, action_dim=2, init_logstd=-0.5)
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=8, num_epochs=2, num_mini_batches=4,
        gamma=0.99, gae_lambda=0.95, max_steps=40, seed=0,
    )
    runner = EmbodiedRunner(
        cfg, envs, policy,
        optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
    )
    hist = runner.run(max_steps=30)
    first = np.mean([h["rollout/reward_mean"] for h in hist[:3]])
    last = np.mean([h["rollout/reward_mean"] for h in hist[-3:]])
    # Optimal mean-reward is bounded by exploration noise (-2*std^2);
    # require clear improvement and a near-noise-floor final value.
    assert last > first + 0.05, f"no learning {first:.4f} -> {last:.4f}"
    assert last > -0.4, f"final reward too low: {last:.4f}"


def test_ppo_learns_point_reach_and_success_rises():
    envs = [PointReachEnv(num_envs=64, seed=0, max_episode_steps=16)]
    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2, init_logstd=-0.5)
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=16, num_epochs=2, num_mini_batches=4,
        gamma=0.9, gae_lambda=0.95, max_steps=40, seed=0,
    )
    runner = EmbodiedRunner(
        cfg, envs, policy, optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
    )
    hist = runner.run(max_steps=40)
    early = np.mean([h.get("env/success_once", 0.0) for h in hist[:5]])
    late = np.mean([h.get("env/success_once", 0.0) for h in hist[-5:]])
    assert late > max(2 * early, 0.3), f"success_once {early:.3f} -> {late:.3f}"


def test_stage_pipelining_equivalent_metrics():
    """Two stages of 32 envs behave like one stage of 64 (same contract)."""
    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2)
    envs2 = [
        PointReachEnv(num_envs=32, seed=0, max_episode_steps=8),
        PointReachEnv(num_envs=32, seed=1, max_episode_steps=8),
    ]
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=8, num_epochs=1, num_mini_batches=2, max_steps=2,
    )
    runner = EmbodiedRunner(cfg, envs2, policy)
    out = runner.run_step()
    assert out["rollout/env_steps"] == 8 * 64
    assert np.isfinite(out["actor/loss"])


def test_eval_deterministic(tmp_path):
    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2)
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=4, num_epochs=1, num_mini_batches=1, max_steps=1,
        eval_interval=1, eval_steps=8,
    )
    runner = EmbodiedRunner(
        cfg,
        [PointReachEnv(num_envs=16, seed=0)],
        policy,
        eval_envs=[PointReachEnv(num_envs=16, seed=100, max_episode_steps=4)],
    )
    out = runner.run_step()
    assert any(k.startswith("eval/") for k in out)


def test_opd_distillation_pulls_student_to_teacher():
    """OPD: with a trained 'teacher' and zero env reward, the reverse-KL
    advantage must pull the student's actions toward the teacher's."""
    import jax
    import jax.numpy as jnp

    class ZeroRewardBandit(BanditEnv):
        def step(self, actions):
            out = super().step(actions)
            out.reward[:] = 0.0
            return out

    from rlinf_tpu.models.embodiment.mlp_policy import (
        gaussian_entropy, gaussian_logprob,
    )

    class AnalyticTeacher:
        """Deterministic teacher: mean = 0.7 * obs, fixed logstd."""

        def default_forward(self, params, obs, actions):
            mean = 0.7 * obs["states"].astype(jnp.float32)
            logstd = jnp.full_like(mean, -1.0)
            return {
                "logprobs": gaussian_logprob(mean, logstd, actions),
                "entropy": gaussian_entropy(logstd),
            }

        def predict_action_batch(self, params, rng, obs, *, deterministic=False):
            from rlinf_tpu.models.embodiment.base_policy import PolicyOutput

            mean = 0.7 * obs["states"].astype(jnp.float32)
            return PolicyOutput(actions=mean, logprobs=jnp.zeros_like(mean),
                                values=None)

    teacher = AnalyticTeacher()
    t_params = {}

    student = MLPGaussianPolicy(obs_dim=2, action_dim=2, init_logstd=-0.5)
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=8, num_epochs=2, num_mini_batches=2,
        gamma=0.0, normalize_advantages=False, max_steps=40, seed=1,
    )
    runner = EmbodiedRunner(
        cfg, [ZeroRewardBandit(num_envs=64, seed=0)], student,
        optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
        teacher=(teacher, t_params), opd_coef=1.0,
    )

    obs = {"states": jnp.asarray(np.random.default_rng(3).normal(size=(64, 2)), jnp.float32)}
    def gap():
        t_act = teacher.predict_action_batch(
            t_params, jax.random.PRNGKey(0), obs, deterministic=True).actions
        s_act = student.predict_action_batch(
            runner.state.params, jax.random.PRNGKey(0), obs, deterministic=True).actions
        return float(np.mean(np.abs(np.asarray(t_act) - np.asarray(s_act))))

    before = gap()
    runner.run(max_steps=30)
    after = gap()
    assert after < before * 0.7, f"OPD did not distill: {before:.3f} -> {after:.3f}"
