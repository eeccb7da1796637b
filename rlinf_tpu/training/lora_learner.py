"""LoRA policy training: differentiate the PPO/GRPO loss w.r.t. the
low-rank adapters only.

Reference analog: LoRA fine-tuning in the FSDP actor (reference
guides/lora.rst; peft-wrapped HF models in hybrid_engines/fsdp). Here the
base params are a frozen runtime ARGUMENT of the jitted step (not traced
constants), the optimizer state covers only the adapter tree (~1000x
smaller than the model for rank 16 on 0.5B), and the rank-r merge runs
inside the step where XLA fuses it.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.lora import LoRAConfig, merge_lora
from rlinf_tpu.training.learner import (
    PolicyLossConfig,
    microbatch_loss_with_moe,
    optax_global_norm,
)
from rlinf_tpu.training.train_state import TrainState


def make_lora_policy_train_step(
    cfg: LLMConfig,
    loss_cfg: PolicyLossConfig,
    tx,
    lora_cfg: LoRAConfig,
    *,
    num_microbatches: int = 1,
    remat: bool = True,
    attn_impl: str = "xla",
) -> Callable[[TrainState, Any, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """Returns jitted ``(lora_state, base_params, batch) -> (lora_state, metrics)``.

    ``lora_state.params`` is the adapter tree; ``base_params`` stays frozen
    and is donated-free (read-only). Batch contract matches
    make_policy_train_step (training/learner.py:93).
    """

    def loss_fn(lora_params, base_params, mb, global_valid):
        params = merge_lora(base_params, lora_params, lora_cfg)
        return microbatch_loss_with_moe(
            params, cfg, loss_cfg, mb, global_valid,
            attn_impl=attn_impl, remat=remat,
        )

    def train_step(state: TrainState, base_params, batch):
        global_valid = jnp.maximum(
            jnp.sum(batch["loss_mask"].astype(jnp.float32)), 1.0
        )
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if num_microbatches == 1:
            (loss, metrics), grads = grad_fn(
                state.params, base_params, batch, global_valid
            )
        else:
            def reshape(x):
                return x.reshape(num_microbatches, -1, *x.shape[1:])

            mbs = jax.tree_util.tree_map(reshape, batch)

            def scan_body(carry, mb):
                acc_grads, acc_loss = carry
                (loss, metrics), grads = grad_fn(
                    state.params, base_params, mb, global_valid
                )
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc_grads, acc_loss + loss), metrics

            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (grads, loss), metrics_stack = jax.lax.scan(
                scan_body, (zero, jnp.zeros((), jnp.float32)), mbs
            )
            metrics = jax.tree_util.tree_map(
                lambda m: jnp.mean(m, 0), metrics_stack
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)).astype(p.dtype),
            state.params, updates,
        )
        metrics = dict(metrics)
        metrics["actor/loss"] = loss
        metrics["actor/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt_state), metrics

    return jax.jit(train_step, donate_argnums=(0,))
