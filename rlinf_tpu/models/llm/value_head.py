"""Scalar value head over LLM hidden states (the critic model).

Reference analog: LinearForLastLayer value head grafted onto the Megatron GPT
(reference rlinf/hybrid_engines/megatron/megatron_model_manager.py:134) and
MegatronCritic (rlinf/workers/critic/megatron_critic_worker.py). Here the
critic can share the trunk with the actor (one model, two heads) or be a
separate param tree — both are just pytrees.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.config import LLMConfig


def init_value_head(cfg: LLMConfig, rng: jax.Array) -> jax.Array:
    """[D, 1] head, near-zero init (values start ~0)."""
    return (
        jax.random.normal(rng, (cfg.hidden_size, 1), jnp.float32) * 0.01
    )


def add_value_head(params: M.Params, cfg: LLMConfig, rng: jax.Array) -> M.Params:
    out = dict(params)
    out["value_head"] = init_value_head(cfg, rng)
    return out


def forward_values(
    params: M.Params,
    cfg: LLMConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    attn_impl: str = "xla",
    remat: bool = False,
) -> jax.Array:
    """Token-level values [B, T] in fp32."""
    hidden, _ = M.forward_hidden(
        params, cfg, input_ids, attention_mask=attention_mask,
        attn_impl=attn_impl, remat=remat,
    )
    v = jnp.einsum(
        "bsd,do->bso", hidden, params["value_head"],
        preferred_element_type=jnp.float32,
    )
    return v[..., 0]


def value_partition_rules():
    """Extra rule for the value head (replicated; tiny)."""
    from jax.sharding import PartitionSpec as P

    return [(r"value_head", P())]
