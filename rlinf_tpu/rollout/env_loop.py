"""Env <-> policy interaction loop with stage pipelining.

TPU-native analog of the reference's EnvWorker.interact + MultiStepRollout
ping-pong (reference rlinf/workers/env/env_worker.py:1013-1143 and
rlinf/workers/rollout/hf/huggingface_worker.py:672: env sends obs, rollout
computes actions, env steps). Here both sides live in one process: the device
computes actions for stage s+1 while host CPUs step stage s's simulators —
JAX's async dispatch provides the overlap the reference builds with
``pipeline_stage_num`` channel stages (env_worker.py:77,304).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import numpy as np

from rlinf_tpu.data.embodied_io_struct import Trajectory, TrajectoryBuffer
from rlinf_tpu.envs.base import VectorEnv
from rlinf_tpu.models.embodiment.base_policy import Policy


class EnvLoop:
    """Drives N env stages against a jitted policy.

    ``envs`` is a list of independent VectorEnv instances (the stages). With
    k >= 2 stages the device->host->device latency of one stage hides behind
    the compute of the others.
    """

    def __init__(self, envs: List[VectorEnv], policy: Policy):
        self.envs = envs
        self.policy = policy
        self._predict = jax.jit(
            lambda params, rng, obs: policy.predict_action_batch(params, rng, obs)
        )
        self._predict_det = jax.jit(
            lambda params, rng, obs: policy.predict_action_batch(
                params, rng, obs, deterministic=True
            )
        )
        self._value = jax.jit(policy.value)
        self._obs: Optional[List[Dict[str, np.ndarray]]] = None
        self._last_done: Optional[List[np.ndarray]] = None

    @property
    def num_envs(self) -> int:
        return sum(e.num_envs for e in self.envs)

    def reset(self):
        self._obs = [env.reset() for env in self.envs]
        self._last_done = [np.zeros(env.num_envs, np.float32) for env in self.envs]

    def interact(
        self,
        params,
        rng: jax.Array,
        num_steps: int,
        *,
        deterministic: bool = False,
    ) -> Trajectory:
        """Collect ``num_steps`` chunk-steps from every stage; returns one
        merged time-major Trajectory (stages concatenated on the env axis)."""
        if self._obs is None:
            self.reset()

        k = len(self.envs)
        buffers = [TrajectoryBuffer() for _ in range(k)]
        initial_dones = [d.copy() for d in self._last_done]
        predict = self._predict_det if deterministic else self._predict

        for t in range(num_steps):
            # Phase 1: dispatch policy for ALL stages (async on device).
            outs = []
            for s in range(k):
                rng, sub = jax.random.split(rng)
                outs.append(
                    predict(
                        params, sub,
                        {key: jax.numpy.asarray(v) for key, v in self._obs[s].items()},
                        )
                )
            # Phase 2: fetch stage s's actions and step its envs on host while
            # later stages still compute.
            for s in range(k):
                actions = np.asarray(outs[s].actions)
                logprobs = np.asarray(outs[s].logprobs)
                values = (
                    np.asarray(outs[s].values) if outs[s].values is not None else None
                )
                # wire actions (trained on) -> env actions (flow policies
                # extract x1 from the chain, bin policies decode centers)
                step = self.envs[s].step(
                    np.asarray(self.policy.env_actions(actions))
                )
                buffers[s].add(
                    self._obs[s], actions, step.reward, step.done, values, logprobs
                )
                self._obs[s] = step.obs
                self._last_done[s] = step.done.astype(np.float32)

        # Bootstrap values of the final observations.
        trajectories = []
        for s in range(k):
            boot = None
            if buffers[s]._values:
                boot = np.asarray(
                    self._value(
                        params,
                        {key: jax.numpy.asarray(v) for key, v in self._obs[s].items()},
                    )
                )
            trajectories.append(
                buffers[s].build(
                    bootstrap_value=boot,
                    final_done=self._last_done[s],
                    initial_done=initial_dones[s],
                )
            )
        return _merge_stage_trajectories(trajectories)

    def env_metrics(self) -> Dict[str, float]:
        merged: Dict[str, list] = {}
        for env in self.envs:
            for key, v in env.metrics().items():
                merged.setdefault(key, []).append(v)
        return {k: float(np.mean(v)) for k, v in merged.items()}


def _merge_stage_trajectories(trajs: List[Trajectory]) -> Trajectory:
    if len(trajs) == 1:
        return trajs[0]
    cat = lambda xs: np.concatenate(xs, axis=1)
    return Trajectory(
        obs={k: cat([t.obs[k] for t in trajs]) for k in trajs[0].obs},
        actions=cat([t.actions for t in trajs]),
        rewards=cat([t.rewards for t in trajs]),
        dones=cat([t.dones for t in trajs]),
        values=(
            cat([t.values for t in trajs]) if trajs[0].values is not None else None
        ),
        logprobs=cat([t.logprobs for t in trajs]),
    )
