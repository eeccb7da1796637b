"""Simulator adapters behind the VectorEnv contract.

Reference analog: rlinf/envs/ simulator adapters (maniskill/maniskill_env.py:45,
libero, metaworld, isaaclab, robotwin, calvin, d4rl, ... — 19 adapters, each
mapping a sim's native vectorized API onto the common gym-style contract with
``seed_offset``/``total_num_processes`` partitioning, env_worker.py:381-391).

Here one generic ``GymVectorEnv`` adapter covers every gymnasium-API simulator
(ManiSkill3, Metaworld, and robosuite all expose gymnasium envs), and named
adapters pin per-sim obs/reward conventions. Heavy sim packages are
import-gated: constructing an adapter without its package raises an
actionable ImportError, while the module always imports (the reference
achieves the same with its utils/patcher.py stub-importer).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from rlinf_tpu.envs import register_env
from rlinf_tpu.envs.base import EnvOutput, VectorEnv


def _require(module: str, hint: str):
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise ImportError(
            f"{module!r} is required for this env adapter ({hint})") from e


@register_env("gym")
class GymVectorEnv(VectorEnv):
    """Any gymnasium env id → VectorEnv (SyncVectorEnv under the hood).

    Obs mapping: Box observations become {"states": ...}; Dict observations
    keep their keys. Success is read from info["success"] when the sim
    provides it (the ManiSkill/Metaworld convention), else success = episode
    terminated (not truncated).
    """

    def __init__(self, num_envs: int, seed: int = 0, *, env_id: str,
                 env_kwargs: Optional[Dict] = None,
                 partition_rank: int = 0, partition_size: int = 1):
        super().__init__(num_envs, seed)
        gym = _require("gymnasium", "pip install gymnasium")
        kwargs = env_kwargs or {}
        self._venv = gym.vector.SyncVectorEnv(
            [lambda: gym.make(env_id, **kwargs) for _ in range(num_envs)],
        )
        # per-env seeds partitioned across workers (reference
        # env_worker.py:381-391 seed_offset scheme)
        self._seeds = [seed + partition_rank * num_envs + i
                       for i in range(num_envs)]
        space = self._venv.single_action_space
        self._discrete = hasattr(space, "n")
        self.action_dim = int(space.n) if self._discrete else int(
            np.prod(space.shape))
        obs_space = self._venv.single_observation_space
        if hasattr(obs_space, "spaces"):
            self.obs_spec = {k: tuple(s.shape)
                             for k, s in obs_space.spaces.items()}
            self._dict_obs = True
        else:
            self.obs_spec = {"states": tuple(obs_space.shape)}
            self._dict_obs = False
        self.max_episode_steps = getattr(
            self._venv.envs[0], "spec", None
        ) and self._venv.envs[0].spec.max_episode_steps or 1000
        self._ep_success: list = []
        self._ep_return: list = []
        self._ret = np.zeros(num_envs, np.float32)

    def _obs(self, raw) -> Dict[str, np.ndarray]:
        if self._dict_obs:
            return {k: np.asarray(v, np.float32) for k, v in raw.items()}
        return {"states": np.asarray(raw, np.float32)}

    def reset(self) -> Dict[str, np.ndarray]:
        obs, _ = self._venv.reset(seed=self._seeds)
        self._ret[:] = 0.0
        return self._obs(obs)

    def _actions(self, actions: np.ndarray):
        if self._discrete:
            a = np.asarray(actions)
            if a.ndim > 1:       # logits/one-hot → index
                a = np.argmax(a, axis=-1)
            return a.astype(np.int64)
        low = self._venv.single_action_space.low
        high = self._venv.single_action_space.high
        a = np.asarray(actions, np.float32).reshape(
            self.num_envs, *self._venv.single_action_space.shape)
        return np.clip(a, low, high)

    def step(self, actions: np.ndarray) -> EnvOutput:
        obs, reward, term, trunc, info = self._venv.step(
            self._actions(actions))
        reward = np.asarray(reward, np.float32)
        term = np.asarray(term, bool)
        trunc = np.asarray(trunc, bool)
        done = term | trunc
        self._ret += reward
        success = np.asarray(
            info.get("success", term), bool).reshape(-1)[:self.num_envs]
        for i in np.nonzero(done)[0]:
            self._ep_success.append(bool(success[i]))
            self._ep_return.append(float(self._ret[i]))
            self._ret[i] = 0.0
        return EnvOutput(
            obs=self._obs(obs), reward=reward, done=done, terminated=term,
            info={"success": success},
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

    def offload(self):
        self._venv.close()


@register_env("maniskill")
class ManiSkillEnv(GymVectorEnv):
    """ManiSkill3 tasks (reference envs/maniskill/maniskill_env.py:45).
    ManiSkill registers gymnasium ids; obs_mode="state" gives Box states,
    obs_mode="rgb" gives Dict with image keys."""

    def __init__(self, num_envs: int, seed: int = 0, *,
                 env_id: str = "PickCube-v1", obs_mode: str = "state",
                 control_mode: str = "pd_ee_delta_pose", **kw):
        _require("mani_skill", "install ManiSkill3 to use this adapter")
        import mani_skill.envs  # noqa: F401  (registers gym ids)

        super().__init__(
            num_envs, seed, env_id=env_id,
            env_kwargs={"obs_mode": obs_mode, "control_mode": control_mode,
                        **kw})


@register_env("metaworld")
class MetaWorldEnv(GymVectorEnv):
    """Metaworld MT-series tasks via their gymnasium registration."""

    def __init__(self, num_envs: int, seed: int = 0, *,
                 env_id: str = "reach-v2", **kw):
        _require("metaworld", "install metaworld to use this adapter")
        import metaworld  # noqa: F401

        super().__init__(num_envs, seed, env_id=env_id, env_kwargs=kw)


@register_env("libero")
class LiberoEnv(VectorEnv):
    """LIBERO task suites (reference envs/libero). Constructed lazily —
    raises with an actionable message when libero isn't installed."""

    def __init__(self, num_envs: int, seed: int = 0, **kw):
        _require("libero", "install LIBERO to use this adapter")
        raise NotImplementedError(
            "LIBERO adapter requires the libero package present to bind its "
            "OffScreenRenderEnv API; see GymVectorEnv for the contract.")


def load_d4rl_dataset(env_id: str, buffer) -> int:
    """D4RL-style offline dataset → ReplayBuffer transitions (reference
    envs/d4rl + data/datasets d4rl loaders). Uses minari (the maintained
    d4rl successor) when available."""
    minari = _require("minari", "install minari for offline datasets")
    ds = minari.load_dataset(env_id)
    n = 0
    for ep in ds.iterate_episodes():
        T = len(ep.actions)
        item = {
            "obs/states": np.asarray(ep.observations[:-1], np.float32),
            "next_obs/states": np.asarray(ep.observations[1:], np.float32),
            "actions": np.asarray(ep.actions, np.float32),
            "rewards": np.asarray(ep.rewards, np.float32),
            "dones": np.asarray(ep.terminations, np.float32),
        }
        buffer.add(item)
        n += T
    return n
