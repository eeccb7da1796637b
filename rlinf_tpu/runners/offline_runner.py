"""Offline RL driver: train from a stored transition dataset (no env).

Reference analog: OfflineRunner (reference rlinf/runners) driving IQL/BC over
d4rl-style datasets (rlinf/data/datasets d4rl loaders, buffer-backed dataset
embodied_buffer_dataset.py). Dataset = ReplayBuffer (restored from disk or
filled by a prior run) sampled into jitted IQL/DAgger updates.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.data.replay_buffer import ReplayBuffer
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.training.iql_learner import (
    IQLConfig,
    init_iql_extras,
    make_iql_train_step,
)
from rlinf_tpu.training.train_state import (
    OptimizerConfig,
    create_train_state,
    make_optimizer,
)
from rlinf_tpu.utils.checkpoint import CheckpointManager
from rlinf_tpu.utils.metrics import MetricLogger


@dataclasses.dataclass(frozen=True)
class OfflineRunnerConfig:
    algorithm: str = "iql"               # iql | bc
    max_steps: int = 10000
    batch_size: int = 256
    seed: int = 0
    log_dir: Optional[str] = None
    log_interval: int = 100
    checkpoint_dir: Optional[str] = None
    save_interval: int = 1000


class OfflineRunner:
    def __init__(
        self,
        cfg: OfflineRunnerConfig,
        buffer: ReplayBuffer,
        policy: MLPSACPolicy,
        *,
        iql: IQLConfig = IQLConfig(),
        optimizer: OptimizerConfig = OptimizerConfig(
            lr=3e-4, clip_grad=0.0, weight_decay=0.0
        ),
    ):
        self.cfg = cfg
        self.buffer = buffer
        self.policy = policy
        self.logger = MetricLogger(cfg.log_dir, print_every=cfg.log_interval)
        self.tx = make_optimizer(optimizer)
        rng = jax.random.PRNGKey(cfg.seed)
        self._rng, init_rng, extras_rng = jax.random.split(rng, 3)

        def init_fn(r):
            params = policy.init(r)
            if cfg.algorithm == "iql":
                params.update(init_iql_extras(policy, extras_rng))
            return params

        self.state = create_train_state(init_fn, self.tx, init_rng)
        if cfg.algorithm == "iql":
            self.train_step = make_iql_train_step(policy, iql, self.tx)
        elif cfg.algorithm == "bc":
            self.train_step = self._make_bc_step()
        else:
            raise ValueError(f"unknown offline algorithm {cfg.algorithm!r}")
        self.ckpt = (
            CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
        )
        self.global_step = 0

    def _make_bc_step(self):
        """Behavior cloning: max logprob of dataset actions (the DAgger /
        dagger-sft analog, reference fsdp_dagger_policy_worker.py)."""
        policy, tx = self.policy, self.tx
        import optax
        from rlinf_tpu.training.learner import optax_global_norm

        def loss_fn(params, batch):
            obs = {
                k[len("obs/"):]: v for k, v in batch.items()
                if k.startswith("obs/")
            }
            fwd = policy.default_forward(params, obs, batch["actions"])
            loss = -jnp.mean(jnp.sum(fwd["logprobs"], axis=-1))
            return loss, {"bc/nll": loss}

        def step(state, batch):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["bc/grad_norm"] = optax_global_norm(grads)
            from rlinf_tpu.training.train_state import TrainState

            return TrainState(state.step + 1, new_params, new_opt), metrics

        return jax.jit(step, donate_argnums=(0,))

    def run_step(self) -> Dict[str, float]:
        batch_np = self.buffer.sample_transitions(self.cfg.batch_size)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if k != "versions"}
        if self.cfg.algorithm == "iql":
            self.state, metrics = self.train_step(self.state, batch)
        else:
            self.state, metrics = self.train_step(self.state, batch)
        self.global_step += 1
        out = {k: float(np.asarray(v)) for k, v in metrics.items()}
        if self.global_step % self.cfg.log_interval == 0:
            self.logger.log(out, self.global_step)
        if self.ckpt and self.global_step % self.cfg.save_interval == 0:
            self.ckpt.save(self.global_step, self.state)
        return out

    def run(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        n = max_steps or self.cfg.max_steps
        out = {}
        while self.global_step < n:
            out = self.run_step()
        return out
