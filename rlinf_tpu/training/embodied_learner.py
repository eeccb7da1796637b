"""Jitted PPO actor-critic update for embodied policies.

Reference analog: EmbodiedFSDPActor.run_training / train_micro_batch
(reference rlinf/workers/actor/fsdp_actor_worker.py:1492,1599) driving
compute_ppo_actor_critic_loss (losses.py:383). Loss semantics match:
per-action-dim logprobs with clip on the per-dim ratio, huber value clip,
entropy bonus.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.algorithms.losses import (
    compute_ppo_actor_loss,
    compute_ppo_critic_loss,
)
from rlinf_tpu.algorithms.utils import masked_mean
from rlinf_tpu.models.embodiment.base_policy import Policy
from rlinf_tpu.training.train_state import TrainState
from rlinf_tpu.training.learner import optax_global_norm


@dataclasses.dataclass(frozen=True)
class EmbodiedLossConfig:
    """Mirrors the reference embodied actor YAML block
    (examples/embodiment/config/*: clip ratios, value_clip, huber_delta,
    entropy_bonus)."""

    clip_ratio_low: float = 0.2
    clip_ratio_high: float = 0.2
    clip_ratio_c: Optional[float] = None
    value_clip: float = 0.2
    huber_delta: float = 10.0
    entropy_bonus: float = 0.0
    value_coef: float = 1.0
    #: weight of the optional SFT (behavior-cloning) mixing term computed on
    #: demo batches passed alongside the RL batch (reference
    #: fsdp_actor_worker.py:1416 SFT mixing)
    sft_coef: float = 0.0


def make_embodied_train_step(
    policy: Policy,
    loss_cfg: EmbodiedLossConfig,
    tx,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """Batch dict (flattened [N, ...]):
      obs/<key>, actions [N, A], old_logprobs [N, A], advantages [N],
      returns [N], prev_values [N].
    """

    def loss_fn(params, batch):
        obs = {
            k[len("obs/"):]: v for k, v in batch.items() if k.startswith("obs/")
        }
        fwd = policy.default_forward(params, obs, batch["actions"])
        logprobs = fwd["logprobs"]                       # [N, A]
        adv = batch["advantages"][:, None]               # broadcast over dims

        actor_loss, am = compute_ppo_actor_loss(
            logprobs=logprobs,
            old_logprobs=batch["old_logprobs"],
            advantages=jnp.broadcast_to(adv, logprobs.shape),
            clip_ratio_low=loss_cfg.clip_ratio_low,
            clip_ratio_high=loss_cfg.clip_ratio_high,
            clip_ratio_c=loss_cfg.clip_ratio_c,
        )
        critic_loss, cm = compute_ppo_critic_loss(
            values=fwd["values"],
            returns=batch["returns"],
            prev_values=batch["prev_values"],
            value_clip=loss_cfg.value_clip,
            huber_delta=loss_cfg.huber_delta,
        )
        entropy = jnp.mean(fwd["entropy"])
        loss = (
            actor_loss
            + loss_cfg.value_coef * critic_loss
            - loss_cfg.entropy_bonus * entropy
        )
        metrics = {**am, **cm, "actor/entropy": entropy}
        if loss_cfg.sft_coef > 0 and any(
            k.startswith("sft_obs/") for k in batch
        ):
            sft_obs = {
                k[len("sft_obs/"):]: v for k, v in batch.items()
                if k.startswith("sft_obs/")
            }
            sft_fwd = policy.default_forward(
                params, sft_obs, batch["sft_actions"]
            )
            sft_nll = -jnp.mean(jnp.sum(sft_fwd["logprobs"], axis=-1))
            loss = loss + loss_cfg.sft_coef * sft_nll
            metrics["actor/sft_nll"] = jax.lax.stop_gradient(sft_nll)
        return loss, metrics

    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["actor/loss"] = loss
        metrics["actor/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
