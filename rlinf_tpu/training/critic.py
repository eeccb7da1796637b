"""Separate-critic PPO: the critic as its own model + optimizer.

Reference analog: MegatronCritic — a dedicated critic worker with its own
GPT trunk, optimizer, and warmup schedule
(reference rlinf/workers/critic/megatron_critic_worker.py; critic warmup in
the PPO runner config ``critic.warmup_steps``). The shared-trunk value head
(make_actor_critic_train_step, learner.py:350) remains the cheap option;
this module is the first-class PPO configuration where actor and critic
never share parameters:

  * critic = full LLM trunk (optionally smaller than the actor) + scalar
    value head, its own TrainState / AdamW;
  * trained every step on clipped-value huber loss vs GAE returns;
  * ``warmup_steps`` critic-only steps before the first actor update — the
    standard PPO trick so early high-variance value targets don't corrupt
    the policy (reference critic_warmup, rlinf config
    algorithm.critic_warmup).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.training.train_state import TrainState


@dataclasses.dataclass(frozen=True)
class CriticConfig:
    """``algorithm.critic='separate'`` knobs (reference critic worker cfg)."""

    value_clip: float = 0.2
    huber_delta: float = 10.0
    #: critic-only steps before the first actor update
    warmup_steps: int = 0
    #: None = reuse the actor's optimizer config
    lr: Optional[float] = None


def init_critic_params(cfg: LLMConfig, rng: jax.Array) -> Dict:
    """Full trunk + near-zero value head; no LM head is ever used."""
    from rlinf_tpu.models.llm.value_head import add_value_head

    k1, k2 = jax.random.split(rng)
    return add_value_head(M.init_params(cfg, k1), cfg, k2)


def make_critic_value_fn(cfg: LLMConfig, *, attn_impl: str = "xla"):
    """Jitted fp32 token values [B, T] from the critic's own trunk."""
    from rlinf_tpu.models.llm.value_head import forward_values

    def value_fn(params, input_ids, attention_mask):
        return forward_values(
            params, cfg, input_ids, attention_mask, attn_impl=attn_impl
        )

    return jax.jit(value_fn)


def make_critic_train_step(
    cfg: LLMConfig,
    critic_cfg: CriticConfig,
    tx,
    *,
    remat: bool = True,
    attn_impl: str = "xla",
    mesh=None,
):
    """One critic update on a batch with ``returns`` / ``prev_values``."""
    from rlinf_tpu.algorithms.losses import compute_ppo_critic_loss
    from rlinf_tpu.models.llm.value_head import forward_values
    from rlinf_tpu.training.learner import optax_global_norm

    def loss_fn(params, batch):
        values = forward_values(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            attn_impl=attn_impl, remat=remat,
        )
        loss, metrics = compute_ppo_critic_loss(
            values=values,
            returns=batch["returns"],
            prev_values=batch["prev_values"],
            value_clip=critic_cfg.value_clip,
            huber_delta=critic_cfg.huber_delta,
            loss_mask=batch["loss_mask"],
        )
        return loss, metrics

    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (
                p.astype(jnp.float32) + u.astype(jnp.float32)
            ).astype(p.dtype),
            state.params, updates,
        )
        metrics = dict(metrics)
        metrics["critic/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
