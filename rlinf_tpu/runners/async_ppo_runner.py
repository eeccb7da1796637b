"""Async PPO actor-learner with decoupled-PPO policy-lag correction.

Reference analog: the async PPO path (reference
rlinf/workers/actor/async_ppo_fsdp_worker.py + AsyncEmbodiedRunner
async_embodied_runner.py:157): rollout runs continuously against stale
params; each trajectory is stamped with the producing param version; the
learner trains on whatever arrives, correcting the off-policyness with the
decoupled-PPO proximal anchor (losses.py:27 — alpha-interpolated proximal
logprobs from version lag).
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
import optax

from rlinf_tpu.algorithms import get_advantage_fn
from rlinf_tpu.algorithms.losses import (
    compute_decoupled_ppo_actor_loss,
    compute_ppo_critic_loss,
)
from rlinf_tpu.envs.base import VectorEnv
from rlinf_tpu.models.embodiment.base_policy import Policy
from rlinf_tpu.rollout.env_loop import EnvLoop
from rlinf_tpu.training.train_state import (
    OptimizerConfig,
    TrainState,
    create_train_state,
    make_optimizer,
)
from rlinf_tpu.training.learner import optax_global_norm
from rlinf_tpu.utils.metrics import MetricLogger


@dataclasses.dataclass(frozen=True)
class AsyncPPOConfig:
    total_train_steps: int = 500
    rollout_chunk_steps: int = 16
    num_epochs: int = 1
    num_mini_batches: int = 2
    gamma: float = 0.99
    gae_lambda: float = 0.95
    normalize_advantages: bool = True
    clip_ratio_low: float = 0.2
    clip_ratio_high: float = 0.2
    value_clip: float = 0.2
    huber_delta: float = 10.0
    weight_sync_interval: int = 1     # learner steps between param swaps
    seed: int = 0
    log_dir: Optional[str] = None
    log_interval: int = 20


class AsyncPPORunner:
    def __init__(
        self,
        cfg: AsyncPPOConfig,
        envs: List[VectorEnv],
        policy: Policy,
        *,
        optimizer: OptimizerConfig = OptimizerConfig(lr=3e-4, clip_grad=1.0),
    ):
        self.cfg = cfg
        self.policy = policy
        self.loop = EnvLoop(envs, policy)
        self.logger = MetricLogger(cfg.log_dir, print_every=cfg.log_interval)
        self.tx = make_optimizer(optimizer)
        rng = jax.random.PRNGKey(cfg.seed)
        self._rng, init_rng, self._rollout_rng = jax.random.split(rng, 3)
        self.state = create_train_state(policy.init, self.tx, init_rng)
        self.train_step = self._make_train_step()

        self.rollout_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
        self.param_version = 0
        self._queue: "queue.Queue" = queue.Queue(maxsize=4)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.global_step = 0

    # ------------------------------------------------------------------
    def _make_train_step(self):
        cfg, policy, tx = self.cfg, self.policy, self.tx

        def loss_fn(params, batch, current_version):
            obs = {
                k[len("obs/"):]: v for k, v in batch.items()
                if k.startswith("obs/")
            }
            fwd = policy.default_forward(params, obs, batch["actions"])
            logprobs = fwd["logprobs"]
            adv = jnp.broadcast_to(
                batch["advantages"][:, None], logprobs.shape
            )
            actor_loss, am = compute_decoupled_ppo_actor_loss(
                logprobs=logprobs,
                old_logprobs=batch["old_logprobs"],
                advantages=adv,
                versions=jnp.broadcast_to(
                    batch["versions"][:, None], logprobs.shape
                ),
                current_version=current_version,
                clip_ratio_low=cfg.clip_ratio_low,
                clip_ratio_high=cfg.clip_ratio_high,
            )
            critic_loss, cm = compute_ppo_critic_loss(
                values=fwd["values"],
                returns=batch["returns"],
                prev_values=batch["prev_values"],
                value_clip=cfg.value_clip,
                huber_delta=cfg.huber_delta,
            )
            return actor_loss + critic_loss, {**am, **cm}

        def step(state: TrainState, batch, current_version):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, current_version
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["actor/loss"] = loss
            metrics["actor/grad_norm"] = optax_global_norm(grads)
            return TrainState(state.step + 1, new_params, new_opt), metrics

        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _rollout_forever(self):
        while not self._stop.is_set():
            self._rollout_rng, sub = jax.random.split(self._rollout_rng)
            params, version = self.rollout_params, self.param_version
            traj = self.loop.interact(params, sub, self.cfg.rollout_chunk_steps)
            try:
                self._queue.put((traj, version), timeout=1.0)
            except queue.Full:
                pass  # drop stale work; PPO wants fresh data anyway

    def _chunk_to_batch(self, traj, version) -> Dict[str, jnp.ndarray]:
        gae = get_advantage_fn("gae")
        adv, ret = gae(
            rewards=jnp.asarray(traj.rewards),
            values=jnp.asarray(traj.values),
            dones=jnp.asarray(traj.dones),
            gamma=self.cfg.gamma,
            gae_lambda=self.cfg.gae_lambda,
            normalize_advantages=self.cfg.normalize_advantages,
        )
        flat = traj.flatten()
        N = flat["actions"].shape[0]
        flat["advantages"] = np.asarray(adv).reshape(N)
        flat["returns"] = np.asarray(ret).reshape(N)
        flat["prev_values"] = flat.pop("values")
        flat["old_logprobs"] = flat.pop("logprobs")
        flat["versions"] = np.full(N, version, np.float32)
        flat.pop("rewards")
        return {k: jnp.asarray(v) for k, v in flat.items()}

    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        n = max_steps or self.cfg.total_train_steps
        self._stop.clear()
        self._thread = threading.Thread(target=self._rollout_forever, daemon=True)
        self._thread.start()
        history: List[Dict[str, float]] = []
        try:
            while self.global_step < n:
                if not self._thread.is_alive():
                    raise RuntimeError("rollout thread died")
                traj, version = self._queue.get(timeout=60.0)
                batch = self._chunk_to_batch(traj, version)
                N = batch["actions"].shape[0]
                metrics = {}
                for _ in range(self.cfg.num_epochs):
                    perm = np.asarray(
                        jax.random.permutation(self._next_rng(), N)
                    )
                    for idx in np.split(perm, self.cfg.num_mini_batches):
                        mb = {k: v[jnp.asarray(idx)] for k, v in batch.items()}
                        self.state, metrics = self.train_step(
                            self.state, mb, float(self.param_version)
                        )
                self.global_step += 1
                if self.global_step % self.cfg.weight_sync_interval == 0:
                    self.rollout_params = jax.tree_util.tree_map(
                        jnp.copy, self.state.params
                    )
                    self.param_version += 1
                out = {k: float(np.asarray(v)) for k, v in metrics.items()}
                out["rollout/reward_mean"] = float(traj.rewards.mean())
                out["async/version_lag"] = self.param_version - float(version)
                out.update(self.loop.env_metrics())
                history.append(out)
                if self.global_step % self.cfg.log_interval == 0:
                    self.logger.log(out, self.global_step)
        finally:
            self._stop.set()
            if self._thread is not None:
                self._thread.join(timeout=10.0)
        return history

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub
