"""Asynchronous embodied actor-learner (SAC / async PPO).

Reference analog: AsyncEmbodiedRunner (reference
rlinf/runners/async_embodied_runner.py:157-203): env/rollout loops launched
once and running forever, the learner continuously draining a replay channel,
bumping a version counter, and weight-syncing every ``weight_sync_interval``
without blocking rollout. Policy lag is handled by per-sample version stamps
+ the decoupled-PPO loss (losses.py:27 analog).

Single-host TPU form: the rollout loop runs in a background thread against a
snapshot params reference that the learner swaps atomically (JAX arrays are
immutable, so a swap is race-free — the thread sees either the old or the new
pytree, never a torn one). Trajectories flow through a bounded queue — the
in-program analog of the reference's named Channel.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.data.replay_buffer import ReplayBuffer
from rlinf_tpu.envs.base import VectorEnv
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.rollout.env_loop import EnvLoop
from rlinf_tpu.training.sac_learner import SACConfig, make_sac_train_step
from rlinf_tpu.training.train_state import (
    OptimizerConfig,
    create_train_state,
    make_optimizer,
)
from rlinf_tpu.utils.metrics import MetricLogger


@dataclasses.dataclass(frozen=True)
class AsyncRunnerConfig:
    total_train_steps: int = 1000
    rollout_chunk_steps: int = 16       # env steps per produced chunk
    train_batch_size: int = 256
    warmup_transitions: int = 1000      # before first update
    weight_sync_interval: int = 10      # learner steps between param swaps
    updates_per_chunk: float = 1.0      # UTD control (throttles learner)
    replay_capacity: int = 1000         # items (chunks)
    seed: int = 0
    log_dir: Optional[str] = None
    log_interval: int = 50


class AsyncEmbodiedRunner:
    """SAC actor-learner with continuous background rollout."""

    def __init__(
        self,
        cfg: AsyncRunnerConfig,
        envs: List[VectorEnv],
        policy: MLPSACPolicy,
        *,
        sac: SACConfig = SACConfig(),
        optimizer: OptimizerConfig = OptimizerConfig(
            lr=3e-4, clip_grad=0.0, weight_decay=0.0
        ),
    ):
        self.cfg = cfg
        self.policy = policy
        self.loop = EnvLoop(envs, policy)
        self.logger = MetricLogger(cfg.log_dir, print_every=cfg.log_interval)

        self.tx = make_optimizer(optimizer)
        rng = jax.random.PRNGKey(cfg.seed)
        self._rng, init_rng, self._rollout_rng = jax.random.split(rng, 3)
        self.state = create_train_state(policy.init, self.tx, init_rng)
        self.train_step = make_sac_train_step(policy, sac, self.tx)

        self.buffer = ReplayBuffer(cfg.replay_capacity, seed=cfg.seed)
        self._chunk_queue: "queue.Queue" = queue.Queue(maxsize=8)
        # rollout reads this snapshot; learner swaps it atomically. Copied
        # because the first train step DONATES state.params' buffers.
        self.rollout_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
        self.param_version = 0
        self._stop = threading.Event()
        self._rollout_thread: Optional[threading.Thread] = None
        self._chunks_produced = 0
        self.global_step = 0

    # ------------------------------------------------------------------
    def _rollout_forever(self):
        while not self._stop.is_set():
            self._rollout_rng, sub = jax.random.split(self._rollout_rng)
            params, version = self.rollout_params, self.param_version
            traj = self.loop.interact(params, sub, self.cfg.rollout_chunk_steps)
            T, B = traj.num_steps, traj.num_envs
            # [T, B, ...] -> flat transitions with next_obs and version stamps
            chunk = {
                "actions": traj.actions[:].reshape(T * B, -1),
                "rewards": traj.rewards.reshape(T * B),
                "dones": traj.dones[1:].reshape(T * B).astype(np.float32),
                "versions": np.full(T * B, version, np.int32),
            }
            for k, v in traj.obs.items():
                nxt = np.concatenate([v[1:], v[-1:]], axis=0)
                chunk[f"obs/{k}"] = v.reshape(T * B, *v.shape[2:])
                chunk[f"next_obs/{k}"] = nxt.reshape(T * B, *v.shape[2:])
            try:
                self._chunk_queue.put(chunk, timeout=1.0)
                self._chunks_produced += 1
            except queue.Full:
                pass  # learner behind: drop (off-policy, buffer still fresh)

    def _drain_queue(self):
        drained = 0
        while True:
            try:
                chunk = self._chunk_queue.get_nowait()
            except queue.Empty:
                return drained
            self.buffer.add(chunk)
            drained += 1

    # ------------------------------------------------------------------
    def run(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        n = max_steps or self.cfg.total_train_steps
        self._stop.clear()
        self._rollout_thread = threading.Thread(
            target=self._rollout_forever, daemon=True
        )
        self._rollout_thread.start()
        metrics = {}
        try:
            # warmup
            while self.buffer.total_transitions < self.cfg.warmup_transitions:
                if not self._rollout_thread.is_alive():
                    raise RuntimeError(
                        "rollout thread died during warmup; see traceback above"
                    )
                self._drain_queue()
                time.sleep(0.01)

            while self.global_step < n:
                self._drain_queue()
                batch_np = self.buffer.sample_transitions(
                    self.cfg.train_batch_size
                )
                batch_np.pop("versions", None)
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                self._rng, sub = jax.random.split(self._rng)
                self.state, metrics = self.train_step(self.state, batch, sub)
                self.global_step += 1

                if self.global_step % self.cfg.weight_sync_interval == 0:
                    # Non-blocking weight sync (reference no_wait=True analog).
                    # MUST copy: the jitted train step donates the state
                    # buffers, so handing the live pytree to the rollout
                    # thread would leave it holding deleted buffers.
                    self.rollout_params = jax.tree_util.tree_map(
                        jnp.copy, self.state.params
                    )
                    self.param_version += 1

                if self.global_step % self.cfg.log_interval == 0:
                    out = {
                        k: float(np.asarray(v)) for k, v in metrics.items()
                    }
                    out.update(self.loop.env_metrics())
                    out["async/buffer_transitions"] = float(
                        self.buffer.total_transitions
                    )
                    out["async/chunks_produced"] = float(self._chunks_produced)
                    out["async/param_version"] = float(self.param_version)
                    self.logger.log(out, self.global_step)
                # UTD throttle: don't run far ahead of data production
                target_updates = (
                    self._chunks_produced
                    * self.cfg.rollout_chunk_steps
                    * self.loop.num_envs
                    * self.cfg.updates_per_chunk
                    / self.cfg.train_batch_size
                )
                while (
                    self.global_step > target_updates + 5
                    and not self._stop.is_set()
                ):
                    if not self._rollout_thread.is_alive():
                        raise RuntimeError(
                            "rollout thread died; see its traceback above"
                        )
                    time.sleep(0.005)
                    self._drain_queue()
                    target_updates = (
                        self._chunks_produced
                        * self.cfg.rollout_chunk_steps
                        * self.loop.num_envs
                        * self.cfg.updates_per_chunk
                        / self.cfg.train_batch_size
                    )
        finally:
            self._stop.set()
            if self._rollout_thread is not None:
                self._rollout_thread.join(timeout=10.0)
        # final weight sync so evaluation sees the trained policy
        self.rollout_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
        return {k: float(np.asarray(v)) for k, v in metrics.items()}

    def evaluate(self, env: VectorEnv, num_steps: int = 64) -> Dict[str, float]:
        loop = EnvLoop([env], self.policy)
        loop.reset()
        loop.env_metrics()
        self._rng, sub = jax.random.split(self._rng)
        loop.interact(self.state.params, sub, num_steps, deterministic=True)
        return {f"eval/{k}": v for k, v in loop.env_metrics().items()}
