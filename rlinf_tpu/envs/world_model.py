"""World-model env: RL rollout inside a learned dynamics model.

Reference analog: rlinf/envs/world_model/{base_world_env.py:27,
world_model_opensora_env.py:43} — the simulator is a learned generative
model: reset draws initial states from a dataset, step runs the model
conditioned on actions, rewards/terminations come from model heads. "Dream
training": the policy trains against the world model, transferring to the
real env.

TPU design: the world model's batched step is one jitted device function, so
stepping N dream envs costs one forward — unlike the reference where env
stepping is a separate GPU worker process, the dream env IS device compute
and pipelines with the policy forward inside the same program.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.envs import register_env
from rlinf_tpu.envs.base import EnvOutput, VectorEnv


@register_env("world_model")
class WorldModelEnv(VectorEnv):
    """VectorEnv over a learned dynamics model.

    ``initial_states`` [N, S] pool (dataset reset states, reference
    base_world_env._build_dataset); auto-reset resamples from it. ``done``
    comes from the model's done head (prob > done_threshold) plus the step
    horizon; success is defined by ``success_fn(states) -> bool[num_envs]``
    when given (e.g. a learned success classifier), else by the done head.
    """

    def __init__(
        self,
        num_envs: int,
        seed: int = 0,
        *,
        model,
        params,
        initial_states: np.ndarray,
        max_episode_steps: int = 32,
        done_threshold: float = 0.5,
        success_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        super().__init__(num_envs, seed)
        self.model = model
        self.params = params
        self.initial_states = np.asarray(initial_states, np.float32)
        self.max_episode_steps = max_episode_steps
        self.done_threshold = done_threshold
        self.success_fn = success_fn
        self.action_dim = model.action_dim
        self.obs_spec = {"states": (model.obs_dim,)}
        self._rng = np.random.default_rng(seed)
        self._step_fn = jax.jit(model.step)
        self._states = np.zeros((num_envs, model.obs_dim), np.float32)
        self._t = np.zeros(num_envs, np.int32)
        self._succeeded = np.zeros(num_envs, bool)
        self._ret = np.zeros(num_envs, np.float32)
        self._ep_success: list = []
        self._ep_return: list = []

    def update_params(self, params):
        """Swap world-model weights (e.g. after continued model training)."""
        self.params = params

    def _spawn(self, idx: np.ndarray):
        n = int(idx.sum())
        if n == 0:
            return
        rows = self._rng.integers(0, len(self.initial_states), size=n)
        self._states[idx] = self.initial_states[rows]
        self._t[idx] = 0
        self._succeeded[idx] = False
        self._ret[idx] = 0.0

    def reset(self) -> Dict[str, np.ndarray]:
        self._spawn(np.ones(self.num_envs, bool))
        return {"states": self._states.copy()}

    def step(self, actions: np.ndarray) -> EnvOutput:
        next_s, reward, done_p = self._step_fn(
            self.params, jnp.asarray(self._states), jnp.asarray(actions))
        # np.asarray on a jax array is a read-only view; _spawn writes in place
        self._states = np.array(next_s, np.float32)
        reward = np.asarray(reward, np.float32)
        done_p = np.asarray(done_p)
        self._t += 1
        self._ret += reward

        terminated = done_p > self.done_threshold
        if self.success_fn is not None:
            success = np.asarray(self.success_fn(self._states), bool)
        else:
            success = terminated
        self._succeeded |= success
        truncated = self._t >= self.max_episode_steps
        done = terminated | truncated

        final_obs = {"states": self._states.copy()}
        if done.any():
            for i in np.nonzero(done)[0]:
                self._ep_success.append(bool(self._succeeded[i]))
                self._ep_return.append(float(self._ret[i]))
            self._spawn(done)

        return EnvOutput(
            obs={"states": self._states.copy()},
            reward=reward,
            done=done,
            terminated=terminated,
            info={"final_obs": final_obs, "success": success},
        )

    def metrics(self) -> Dict[str, float]:
        out = {}
        if self._ep_success:
            out["env/success_once"] = float(np.mean(self._ep_success))
            out["env/episode_return"] = float(np.mean(self._ep_return))
            out["env/num_episodes"] = float(len(self._ep_success))
        self._ep_success.clear()
        self._ep_return.clear()
        return out
