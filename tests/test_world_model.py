"""World-model ("dream") training: fit dynamics from real transitions, train
PPO inside the learned model, transfer to the real env.

Reference analog: envs/world_model (learned simulator) + the world-model SFT
path; the transfer assertion mirrors the parity harness's "did RL learn"
check on real-env success_once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlinf_tpu.data.replay_buffer import ReplayBuffer
from rlinf_tpu.envs.toy import PointReachEnv
from rlinf_tpu.envs.world_model import WorldModelEnv
from rlinf_tpu.models.embodiment.mlp_policy import MLPGaussianPolicy
from rlinf_tpu.models.embodiment.world_model import (
    MLPWorldModel,
    WorldModelTrainConfig,
    make_world_model_train_step,
)
from rlinf_tpu.runners.embodied_runner import EmbodiedRunner, EmbodiedRunnerConfig
from rlinf_tpu.training.train_state import TrainState


def _collect_random_transitions(n_steps=400, num_envs=16, seed=0):
    env = PointReachEnv(num_envs=num_envs, seed=seed)
    rng = np.random.default_rng(seed)
    obs = env.reset()
    rows = {k: [] for k in
            ("obs/states", "actions", "next_obs/states", "rewards", "dones")}
    for _ in range(n_steps):
        a = rng.uniform(-1, 1, (num_envs, 2)).astype(np.float32)
        out = env.step(a)
        rows["obs/states"].append(obs["states"])
        rows["actions"].append(a)
        # final_obs is the pre-reset next state (the true transition target)
        rows["next_obs/states"].append(out.info["final_obs"]["states"])
        rows["rewards"].append(out.reward)
        rows["dones"].append(out.terminated.astype(np.float32))
        obs = out.obs
    return {k: np.concatenate(v, axis=0) for k, v in rows.items()}


def _fit_world_model(data, steps=600, seed=0):
    model = MLPWorldModel(obs_dim=4, action_dim=2, hidden_sizes=(128, 128))
    tx = optax.adam(1e-3)
    params = model.init(jax.random.PRNGKey(seed))
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step = make_world_model_train_step(model, WorldModelTrainConfig(), tx)
    n = data["actions"].shape[0]
    rng = np.random.default_rng(seed)
    metrics = {}
    for _ in range(steps):
        idx = rng.integers(0, n, size=256)
        batch = {k: jnp.asarray(v[idx]) for k, v in data.items()}
        state, metrics = step(state, batch)
    return model, state.params, metrics


def test_world_model_one_step_accuracy():
    data = _collect_random_transitions()
    model, params, metrics = _fit_world_model(data)
    assert float(metrics["world_model/dynamics_mse"]) < 0.01, metrics

    # held-out transitions
    held = _collect_random_transitions(n_steps=50, seed=99)
    pred_next, pred_r, _ = jax.jit(model.step)(
        params, jnp.asarray(held["obs/states"]), jnp.asarray(held["actions"]))
    err = float(np.mean(np.square(
        np.asarray(pred_next) - held["next_obs/states"])))
    assert err < 0.02, err
    r_err = float(np.mean(np.square(np.asarray(pred_r) - held["rewards"])))
    assert r_err < 0.5, r_err


def test_dream_training_transfers_to_real_env():
    data = _collect_random_transitions()
    model, wm_params, _ = _fit_world_model(data)

    dream_env = WorldModelEnv(
        32, seed=0, model=model, params=wm_params,
        initial_states=data["obs/states"], max_episode_steps=32,
        done_threshold=0.9)
    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2,
                               hidden_sizes=(64, 64))
    runner = EmbodiedRunner(
        EmbodiedRunnerConfig(num_chunk_steps=32, num_epochs=3,
                             num_mini_batches=4, max_steps=40, seed=0),
        [dream_env], policy)
    runner.run()

    # Evaluate the dream-trained policy in the REAL env.
    real = PointReachEnv(num_envs=64, seed=123)
    obs = real.reset()
    predict = jax.jit(lambda p, o: policy.predict_action_batch(
        p, jax.random.PRNGKey(0), o, deterministic=True))
    for _ in range(64):
        a = np.asarray(predict(
            runner.state.params,
            {k: jnp.asarray(v) for k, v in obs.items()}).actions)
        obs = real.step(a).obs
    m = real.metrics()
    # Random policy success on PointReach is ~5-10%; dream training must
    # clearly beat it through the learned dynamics alone.
    assert m["env/success_once"] > 0.5, m
