"""Embodied SFT driver: behavior-clone a policy from collected episodes.

Reference analog: the VLA/VLM SFT entry flow (workers/sft/fsdp_sft_worker
over openpi/dagger/lerobot datasets) — frame batches from an
``EpisodeDataset`` (npz episodes) or any object with ``sample_frames``,
jitted BC step from ``training/policy_sft``, optional held-out env
evaluation, checkpoint/auto-resume with RNG-exact dataloader state.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.models.embodiment.base_policy import Policy
from rlinf_tpu.training.policy_sft import make_policy_sft_train_step
from rlinf_tpu.training.train_state import (
    OptimizerConfig,
    create_train_state,
    make_optimizer,
)
from rlinf_tpu.utils.checkpoint import CheckpointManager
from rlinf_tpu.utils.metrics import MetricLogger
from rlinf_tpu.utils.sync import host_sync


class EmbodiedSFTRunner:
    def __init__(
        self,
        policy: Policy,
        dataset,
        *,
        batch_size: int = 64,
        optimizer: Optional[OptimizerConfig] = None,
        loss_type: str = "auto",
        seed: int = 0,
        log_dir: Optional[str] = None,
        checkpoint_dir: Optional[str] = None,
        save_interval: int = 50,
        eval_env=None,
        eval_episodes: int = 4,
    ):
        self.policy = policy
        self.dataset = dataset
        self.batch_size = batch_size
        self.tx = make_optimizer(optimizer or OptimizerConfig())
        self.train_step = make_policy_sft_train_step(
            policy, self.tx, loss_type=loss_type
        )
        rng = jax.random.PRNGKey(seed)
        self._rng, init_rng = jax.random.split(rng)
        self.state = create_train_state(policy.init, self.tx, init_rng)
        self._np_rng = np.random.default_rng(seed)
        self.logger = MetricLogger(log_dir)
        self.ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
        self.save_interval = save_interval
        self.eval_env = eval_env
        self.eval_episodes = eval_episodes
        self.global_step = 0
        if self.ckpt:
            state, extra, step = self.ckpt.restore(self.state)
            if state is not None:
                self.state = state
                self.global_step = step
                if extra and "np_rng" in extra:
                    self._np_rng.bit_generator.state = extra["np_rng"]

    def _build_batch(self) -> Dict:
        frames = self.dataset.sample_frames(self.batch_size, self._np_rng)
        obs = {
            k.split("/", 1)[1]: jnp.asarray(v)
            for k, v in frames.items() if k.startswith("obs/")
        }
        return {"obs": obs, "actions": jnp.asarray(frames["actions"])}

    def run_step(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        batch = self._build_batch()
        self._rng, sub = jax.random.split(self._rng)
        self.state, metrics = self.train_step(self.state, batch, sub)
        host_sync(metrics)
        self.global_step += 1
        out = {k: float(np.asarray(v)) for k, v in metrics.items()}
        out["time/step"] = time.perf_counter() - t0
        self.logger.log(out, self.global_step)
        if self.ckpt and self.global_step % self.save_interval == 0:
            self.ckpt.save(
                self.global_step, self.state,
                extra={"np_rng": self._np_rng.bit_generator.state},
            )
        return out

    def evaluate(self) -> Dict[str, float]:
        """Deterministic rollout on the held-out env (success metrics)."""
        assert self.eval_env is not None
        from rlinf_tpu.rollout.env_loop import EnvLoop

        loop = EnvLoop([self.eval_env], self.policy)
        self._rng, sub = jax.random.split(self._rng)
        steps = self.eval_env.max_episode_steps * self.eval_episodes
        loop.interact(self.state.params, sub, steps, deterministic=True)
        return loop.env_metrics()

    def run(self, max_steps: int) -> List[Dict[str, float]]:
        history = []
        while self.global_step < max_steps:
            history.append(self.run_step())
        return history
