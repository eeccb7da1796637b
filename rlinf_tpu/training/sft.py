"""Supervised fine-tuning train step for the LLM.

Reference analog: rlinf/workers/sft/fsdp_sft_worker.py (FSDP SFT) — collapsed
to a jitted NLL step over the same TrainBatch layout as RL training (masked
next-token loss on response tokens), so SFT mixing inside RL updates
(reference fsdp_actor_worker.py:1416) is the same code path with a second
batch.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.ops.logprobs import linear_logprobs_and_entropy
from rlinf_tpu.training.train_state import TrainState
from rlinf_tpu.training.learner import optax_global_norm


def make_sft_train_step(
    cfg: LLMConfig,
    tx,
    *,
    num_microbatches: int = 1,
    remat: bool = True,
    attn_impl: str = "xla",
    logprob_chunk_size: int = 512,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """Batch: input_ids/attention_mask/target_ids/loss_mask as in RL training.
    Loss = token-mean NLL over loss_mask (global count across microbatches)."""

    def mb_loss(params, mb, global_valid):
        hidden, _ = M.forward_hidden(
            params, cfg, mb["input_ids"],
            attention_mask=mb["attention_mask"], attn_impl=attn_impl,
            remat=remat,
        )
        lp, _ = linear_logprobs_and_entropy(
            params, cfg, hidden, mb["target_ids"],
            chunk_size=logprob_chunk_size,
        )
        mask = mb["loss_mask"].astype(jnp.float32)
        nll_sum = -jnp.sum(lp * mask)
        return nll_sum / global_valid, {
            "sft/nll_sum": jax.lax.stop_gradient(nll_sum),
        }

    def train_step(state: TrainState, batch):
        global_valid = jnp.maximum(
            jnp.sum(batch["loss_mask"].astype(jnp.float32)), 1.0
        )
        if num_microbatches == 1:
            (loss, aux), grads = jax.value_and_grad(mb_loss, has_aux=True)(
                state.params, batch, global_valid
            )
        else:
            mbs = jax.tree_util.tree_map(
                lambda x: x.reshape(num_microbatches, -1, *x.shape[1:]), batch
            )
            grad_fn = jax.value_and_grad(mb_loss, has_aux=True)

            def body(carry, mb):
                acc, total = carry
                (l, aux), g = grad_fn(state.params, mb, global_valid)
                return (jax.tree_util.tree_map(jnp.add, acc, g), total + l), aux

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (grads, loss), aux = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32)), mbs
            )
            aux = jax.tree_util.tree_map(lambda m: jnp.sum(m, 0), aux)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)).astype(p.dtype),
            state.params, updates,
        )
        metrics = {
            "sft/loss": loss,
            "sft/ppl": jnp.exp(jnp.minimum(loss, 20.0)),
            "sft/grad_norm": optax_global_norm(grads),
            "sft/valid_tokens": global_valid,
        }
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
