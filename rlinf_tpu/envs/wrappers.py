"""Env wrappers: episode collection (lerobot-style export) and frame capture.

Reference analog: rlinf/envs/wrappers/{collect_episode,record_video}.py.
``CollectEpisodeWrapper`` accumulates per-env episodes (obs/action/reward)
and writes finished ones as compressed npz files — the offline-dataset export
path that feeds OfflineRunner / BC.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from rlinf_tpu.envs.base import EnvOutput, VectorEnv


class CollectEpisodeWrapper(VectorEnv):
    """Wraps a VectorEnv; episodes persist to ``directory`` on completion."""

    def __init__(self, env: VectorEnv, directory: str, max_episodes: int = 0):
        self.env = env
        self.directory = directory
        self.max_episodes = max_episodes
        os.makedirs(directory, exist_ok=True)
        self.num_envs = env.num_envs
        self.obs_spec = env.obs_spec
        self.action_dim = env.action_dim
        self.max_episode_steps = env.max_episode_steps
        self._episodes_written = 0
        self._cur: List[Dict[str, list]] = [
            {"obs": [], "actions": [], "rewards": []} for _ in range(env.num_envs)
        ]
        self._last_obs = None

    def reset(self):
        obs = self.env.reset()
        self._last_obs = obs
        for c in self._cur:
            c["obs"].clear(); c["actions"].clear(); c["rewards"].clear()
        return obs

    def step(self, actions: np.ndarray) -> EnvOutput:
        out = self.env.step(actions)
        for i in range(self.num_envs):
            c = self._cur[i]
            c["obs"].append(
                {k: np.asarray(v[i]) for k, v in self._last_obs.items()}
            )
            c["actions"].append(np.asarray(actions[i]))
            c["rewards"].append(float(out.reward[i]))
            if out.done[i]:
                self._flush_episode(i)
        self._last_obs = out.obs
        return out

    def _flush_episode(self, i: int):
        c = self._cur[i]
        if not c["actions"]:
            return
        if self.max_episodes and self._episodes_written >= self.max_episodes:
            c["obs"].clear(); c["actions"].clear(); c["rewards"].clear()
            return
        data = {
            "actions": np.stack(c["actions"]),
            "rewards": np.asarray(c["rewards"], np.float32),
        }
        for key in c["obs"][0]:
            data[f"obs/{key}"] = np.stack([o[key] for o in c["obs"]])
        path = os.path.join(
            self.directory, f"episode_{self._episodes_written:06d}.npz"
        )
        np.savez_compressed(path, **data)
        self._episodes_written += 1
        c["obs"].clear(); c["actions"].clear(); c["rewards"].clear()

    def metrics(self):
        m = self.env.metrics()
        m["collect/episodes_written"] = float(self._episodes_written)
        return m

    @staticmethod
    def load_episodes_to_buffer(directory: str, buffer) -> int:
        """Feed collected episodes into a ReplayBuffer as transition items
        (obs/next_obs/actions/rewards/dones) for offline training."""
        count = 0
        for name in sorted(os.listdir(directory)):
            if not name.endswith(".npz"):
                continue
            with np.load(os.path.join(directory, name)) as z:
                T = z["actions"].shape[0]
                item = {
                    "actions": z["actions"],
                    "rewards": z["rewards"],
                    "dones": np.concatenate(
                        [np.zeros(T - 1, np.float32), np.ones(1, np.float32)]
                    ),
                }
                for k in z.files:
                    if k.startswith("obs/"):
                        obs = z[k]
                        item[k] = obs
                        item["next_" + k] = np.concatenate(
                            [obs[1:], obs[-1:]], axis=0
                        )
            buffer.add(item)
            count += 1
        return count
