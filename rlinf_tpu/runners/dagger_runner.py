"""DAgger driver: expert-relabeled imitation with dataset aggregation.

Reference analog: rlinf/workers/actor/fsdp_dagger_policy_worker.py (717 LoC)
driven through the embodied runner — the student rolls out in the env, every
visited observation is relabeled with the expert's action, the (obs,
expert_action) pairs are appended to a growing on-disk dataset (the
reference's lerobot episode archive / replay-buffer ingest,
recv_rollout_trajectories + _append_lerobot_episode), and the policy is
BC-trained over the aggregate each round (update_buffer_one_epoch /
forward_actor SFT loss).

TPU design: the expert is just another pure policy function, so relabeling is
one extra jitted forward over the already-batched rollout observations; the
aggregate dataset is the disk-persistent ReplayBuffer (data/replay_buffer.py,
the lerobot-archive analog).

Classic DAgger beta-mixing is supported: with probability ``beta`` the env
executes the expert's action instead of the student's (beta annealed
per-iteration), which is the RLT route with a random switch flag.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlinf_tpu.data.replay_buffer import ReplayBuffer
from rlinf_tpu.models.embodiment.base_policy import Policy
from rlinf_tpu.training.learner import optax_global_norm
from rlinf_tpu.training.train_state import (
    OptimizerConfig,
    TrainState,
    create_train_state,
    make_optimizer,
)
from rlinf_tpu.utils.metrics import MetricLogger


def make_bc_train_step(policy: Policy, tx: optax.GradientTransformation,
                       *, loss_type: str = "nll"):
    """BC update: maximize logprob ("nll") or minimize MSE to the expert
    action ("mse", for deterministic/chunked policies — the reference DAgger
    forward_actor path)."""

    def loss_fn(params, batch):
        obs = {k[len("obs/"):]: v for k, v in batch.items()
               if k.startswith("obs/")}
        if loss_type == "nll":
            fwd = policy.default_forward(params, obs, batch["actions"])
            loss = -jnp.mean(jnp.sum(fwd["logprobs"], axis=-1))
        else:
            pi = policy.predict_action_batch(
                params, jax.random.PRNGKey(0), obs, deterministic=True
            ).actions
            loss = jnp.mean(jnp.square(pi - batch["actions"]))
        return loss, {"dagger/bc_loss": loss}

    def step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["dagger/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(step, donate_argnums=(0,))


@dataclasses.dataclass(frozen=True)
class DAggerRunnerConfig:
    num_iterations: int = 10
    rollout_steps: int = 64            # env steps collected per iteration
    updates_per_iteration: int = 50
    batch_size: int = 256
    beta0: float = 1.0                 # expert-execution prob, iter 0
    beta_decay: float = 0.6            # beta_i = beta0 * decay^i
    loss_type: str = "nll"
    seed: int = 0
    log_dir: Optional[str] = None
    log_interval: int = 10


class DAggerRunner:
    """``expert_fn(obs_dict) -> actions [B, A]`` is the relabeling oracle
    (analytic controller, teacher policy apply, or human playback)."""

    def __init__(
        self,
        cfg: DAggerRunnerConfig,
        env,
        policy: Policy,
        expert_fn: Callable[[Dict[str, np.ndarray]], np.ndarray],
        *,
        buffer: Optional[ReplayBuffer] = None,
        optimizer: OptimizerConfig = OptimizerConfig(
            lr=1e-3, clip_grad=1.0, weight_decay=0.0),
    ):
        self.cfg = cfg
        self.env = env
        self.policy = policy
        self.expert_fn = expert_fn
        self.buffer = buffer if buffer is not None else ReplayBuffer(
            capacity=100000, seed=cfg.seed)
        self.logger = MetricLogger(cfg.log_dir, print_every=cfg.log_interval)
        self.tx = make_optimizer(optimizer)
        self._rng, init_rng = jax.random.split(jax.random.PRNGKey(cfg.seed))
        self.state = create_train_state(policy.init, self.tx, init_rng)
        self.train_step = make_bc_train_step(
            policy, self.tx, loss_type=cfg.loss_type)
        self._predict = jax.jit(
            lambda p, r, o: policy.predict_action_batch(
                p, r, o, deterministic=True))
        self.iteration = 0

    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def collect(self, beta: float) -> int:
        """One rollout epoch: relabel every obs with the expert and aggregate.
        Returns the number of pairs added."""
        obs = self.env.reset()
        rng_np = np.random.default_rng(self.cfg.seed + self.iteration)
        added = 0
        for _ in range(self.cfg.rollout_steps):
            expert_a = np.asarray(self.expert_fn(obs), np.float32)
            student_a = np.asarray(self._predict(
                self.state.params, self._next_rng(),
                {k: jnp.asarray(v) for k, v in obs.items()}).actions)
            # beta-mix which action the env EXECUTES; the DATASET always gets
            # the expert label on the visited state (DAgger aggregation).
            use_expert = rng_np.random(expert_a.shape[0]) < beta
            exec_a = np.where(use_expert[:, None], expert_a, student_a)
            self.buffer.add(
                {**{f"obs/{k}": np.asarray(v, np.float32)
                    for k, v in obs.items()},
                 "actions": expert_a},
            )
            added += expert_a.shape[0]
            step = self.env.step(exec_a)
            obs = step.obs
        return added

    def run_iteration(self) -> Dict[str, float]:
        beta = self.cfg.beta0 * (self.cfg.beta_decay ** self.iteration)
        added = self.collect(beta)
        metrics: Dict[str, float] = {}
        for _ in range(self.cfg.updates_per_iteration):
            batch_np = self.buffer.sample_transitions(self.cfg.batch_size)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                     if k != "versions"}
            self.state, m = self.train_step(self.state, batch)
            metrics = {k: float(np.asarray(v)) for k, v in m.items()}
        metrics.update(self.env.metrics())
        metrics["dagger/beta"] = beta
        metrics["dagger/dataset_size"] = float(self.buffer.total_transitions)
        metrics["dagger/pairs_added"] = float(added)
        self.iteration += 1
        self.logger.log(metrics, self.iteration)
        return metrics

    def run(self, num_iterations: Optional[int] = None) -> List[Dict[str, float]]:
        out = []
        for _ in range(num_iterations or self.cfg.num_iterations):
            out.append(self.run_iteration())
        return out
