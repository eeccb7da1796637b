"""Learning tests for the NFT, RLT-AC, and DAgger paths.

Mirrors the reference's e2e-test philosophy (SURVEY.md §4: tiny configs, real
training, assert the algorithm actually learns) for the worker variants
fsdp_nft_policy_worker / fsdp_rlt_ac_policy_worker / fsdp_dagger_policy_worker.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rlinf_tpu.algorithms.rlt import (
    ActorWeightSchedule,
    discounted_chunk_rewards,
    route_actions,
)
from rlinf_tpu.envs.toy import PointReachEnv
from rlinf_tpu.models.embodiment.flow_policy import FlowMatchingPolicy
from rlinf_tpu.models.embodiment.mlp_policy import MLPGaussianPolicy
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.runners.dagger_runner import DAggerRunner, DAggerRunnerConfig
from rlinf_tpu.training.nft_learner import (
    NFTConfig,
    init_nft_state,
    make_nft_train_step,
    nft_tau_at,
    soft_update_rollout,
)
from rlinf_tpu.training.rlt_learner import RLTACConfig, make_rlt_train_step


# ---------------------------------------------------------------------------
# NFT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("loss_form", ["dpo", "mse"])
def test_nft_learns_positive_actions(loss_form):
    """On-policy NFT: the policy's own SDE samples are scored (advantage 1 if
    closer to +obs than to -obs), and the NFT update must shift the flow
    toward the positive region — the reference worker's run_training round
    structure (v_old snapshot, then gradient steps over the round's batch)."""
    policy = FlowMatchingPolicy(obs_dim=2, action_dim=2,
                                hidden_sizes=(64, 64), num_flow_steps=8,
                                sde_noise_scale=0.7)
    ws = (1.0, 1.0) if loss_form == "dpo" else (1.0, 0.3)
    cfg = NFTConfig(loss_form=loss_form, tau=(1.0,), weight_mode="constant",
                    weight_scale=ws)
    tx = optax.adam(1e-3)
    state = init_nft_state(policy, jax.random.PRNGKey(0), tx)
    step = make_nft_train_step(policy, cfg, tx)
    sample = jax.jit(lambda p, r, o: policy.sample_sde(p, r, o))

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    def ode_err(params):
        obs_np = rng_np.uniform(-1.0, 1.0, (512, 2)).astype(np.float32)
        obs = {"states": jnp.asarray(obs_np)}
        a = np.asarray(policy.sample_ode(params, jax.random.PRNGKey(7), obs))
        return float(np.mean(np.sum((a - obs_np) ** 2, axis=-1)))

    err0 = ode_err(state.params)
    metrics, adv = {}, np.zeros(1)
    for rnd in range(50):
        state = soft_update_rollout(state, nft_tau_at(cfg, rnd))
        obs_np = rng_np.uniform(-1.0, 1.0, (256, 2)).astype(np.float32)
        key, kr = jax.random.split(key)
        out = sample(state.params, kr, {"states": jnp.asarray(obs_np)})
        acts = np.asarray(out.actions)
        adv = (np.sum((acts - obs_np) ** 2, -1)
               < np.sum((acts + obs_np) ** 2, -1)).astype(np.float32)
        batch = {
            "obs/states": jnp.asarray(obs_np),
            "actions": jnp.asarray(acts),
            "advantages": jnp.asarray(adv),
            "loss_mask": jnp.ones((256,), jnp.float32),
        }
        for _ in range(4):
            key, k1 = jax.random.split(key)
            state, metrics = step(state, batch, k1)
    err = ode_err(state.params)
    assert err < err0 * 0.4, (err, err0)
    assert adv.mean() > 0.8, adv.mean()   # policy's own samples now positive
    assert np.isfinite(float(metrics["nft/loss"]))


def test_nft_tau_anneal_and_offpolicy_state():
    cfg = NFTConfig(tau=(1.0, 0.1, 10, 20))
    assert nft_tau_at(cfg, 0) == 1.0
    assert nft_tau_at(cfg, 30) == pytest.approx(0.1)
    assert nft_tau_at(cfg, 15) == pytest.approx(0.55)

    # tau < 1 keeps the rollout model lagged behind params
    policy = FlowMatchingPolicy(obs_dim=2, action_dim=2, hidden_sizes=(16,))
    tx = optax.adam(1e-2)
    state = init_nft_state(policy, jax.random.PRNGKey(0), tx)
    step = make_nft_train_step(policy, NFTConfig(tau=(0.5,)), tx)
    rng_np = np.random.default_rng(0)
    obs = rng_np.uniform(-1, 1, (32, 2)).astype(np.float32)
    batch = {
        "obs/states": jnp.asarray(obs),
        "actions": jnp.asarray(obs),
        "advantages": jnp.ones((32,), jnp.float32),
        "loss_mask": jnp.ones((32,), jnp.float32),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    state = soft_update_rollout(state, 0.5)
    p = jax.tree_util.tree_leaves(state.params["velocity"])
    r = jax.tree_util.tree_leaves(state.rollout_params["velocity"])
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(p, r)]
    assert max(diffs) > 0.0  # lagged, not equal


# ---------------------------------------------------------------------------
# RLT routing + schedule
# ---------------------------------------------------------------------------


def test_rlt_route_priority_and_flags():
    B, chunk, A = 4, 3, 2
    student = jnp.zeros((B, chunk, A))
    ref = jnp.ones((B, chunk, A))
    expert = 2.0 * jnp.ones((B, chunk, A))
    out = route_actions(
        student, ref, expert,
        switch_to_ref=jnp.asarray([False, True, True, False]),
        intervene_requested=jnp.asarray([False, False, True, True]),
    )
    np.testing.assert_allclose(np.asarray(out.actions[0]), 0.0)
    np.testing.assert_allclose(np.asarray(out.actions[1]), 1.0)
    np.testing.assert_allclose(np.asarray(out.actions[2]), 2.0)  # expert wins
    np.testing.assert_allclose(np.asarray(out.actions[3]), 2.0)
    assert np.asarray(out.source).tolist() == [0, 1, 2, 2]
    assert np.asarray(out.intervene_flags)[:, 0].tolist() == [
        False, True, True, True]


def test_discounted_chunk_rewards():
    r = jnp.asarray([[1.0, 1.0, 1.0]])
    got = float(discounted_chunk_rewards(r, 0.5)[0, 0])
    assert got == pytest.approx(1.0 + 0.5 + 0.25)


def test_actor_weight_schedule():
    sched = ActorWeightSchedule(
        enable=True, warmup_updates=5, ramp_updates=10,
        warmup_bc_weight=1.0, warmup_q_weight=0.0,
        online_bc_weight=0.2, online_q_weight=1.0)
    w0 = sched.at(0)
    assert w0["bc_weight"] == 1.0 and w0["q_weight"] == 0.0
    w_end = sched.at(100)
    assert w_end["bc_weight"] == pytest.approx(0.2)
    assert w_end["q_weight"] == pytest.approx(1.0)
    w_mid = sched.at(9)  # progress (9-5+1)/10 = 0.5
    assert w_mid["ramp_progress"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# RLT-AC learner
# ---------------------------------------------------------------------------


def test_rlt_ac_learns_bandit_q_and_bc():
    """Bandit: optimal action == obs. Executed actions are random; rows whose
    action is near-optimal are flagged as expert interventions. Both the Q
    head (via reward) and the BC head (via intervened rows) should pull the
    deterministic policy toward obs."""
    policy = MLPSACPolicy(obs_dim=2, action_dim=2, hidden_sizes=(64, 64))
    cfg = RLTACConfig(gamma=0.9, weights=ActorWeightSchedule(
        bc_weight=1.0, q_weight=0.2))
    tx = optax.adam(3e-3)
    params = policy.init(jax.random.PRNGKey(0))
    from rlinf_tpu.training.train_state import TrainState
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step = make_rlt_train_step(policy, cfg, tx)

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(3)

    def pi_err(params):
        obs_np = rng_np.uniform(-0.8, 0.8, (256, 2)).astype(np.float32)
        a, _ = policy.sample_action(
            params, jax.random.PRNGKey(9),
            {"states": jnp.asarray(obs_np)}, deterministic=True)
        return float(np.mean(np.sum((np.asarray(a) - obs_np) ** 2, axis=-1)))

    err0 = pi_err(state.params)
    for i in range(400):
        n = 256
        obs = rng_np.uniform(-0.8, 0.8, (n, 2)).astype(np.float32)
        actions = rng_np.uniform(-1.0, 1.0, (n, 2)).astype(np.float32)
        rewards = -np.sum((actions - obs) ** 2, axis=-1).astype(np.float32)
        intervene = (rewards > -0.1)
        batch = {
            "obs/states": jnp.asarray(obs),
            "next_obs/states": jnp.asarray(obs),
            "actions": jnp.asarray(actions),
            "ref_chunk": jnp.asarray(obs),   # reference chunk = optimal here
            "intervene_flags": jnp.asarray(intervene),
            "rewards": jnp.asarray(rewards),
            "dones": jnp.ones((n,), jnp.float32),
        }
        w = cfg.weights.at(i)
        key, k1 = jax.random.split(key)
        state, metrics = step(state, batch, k1,
                              w["bc_weight"], w["q_weight"])
    err = pi_err(state.params)
    assert err < 0.05, (err0, err)
    assert float(metrics["rlt/human_mask_ratio"]) > 0.0


# ---------------------------------------------------------------------------
# DAgger
# ---------------------------------------------------------------------------


def test_dagger_learns_point_reach():
    env = PointReachEnv(num_envs=64, seed=0)
    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2, hidden_sizes=(64, 64))

    def expert(obs):
        states = obs["states"]
        pos, goal = states[:, :2], states[:, 2:]
        return np.clip((goal - pos) / env.dt, -1.0, 1.0)

    cfg = DAggerRunnerConfig(
        num_iterations=4, rollout_steps=48, updates_per_iteration=120,
        batch_size=256, beta0=1.0, beta_decay=0.5, seed=0)
    runner = DAggerRunner(cfg, env, policy, expert)
    runner.run()

    # Evaluate the student alone.
    eval_env = PointReachEnv(num_envs=64, seed=1)
    obs = eval_env.reset()
    for _ in range(64):
        a = np.asarray(runner._predict(
            runner.state.params, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in obs.items()}).actions)
        obs = eval_env.step(a).obs
    m = eval_env.metrics()
    assert m["env/success_once"] > 0.7, m
    assert runner.buffer.total_transitions == 4 * 48 * 64
