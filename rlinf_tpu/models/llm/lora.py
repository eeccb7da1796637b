"""LoRA adapters for the LLM decoder family.

Reference analog: RLinf's LoRA integration (reference
docs/source-en/rst_source/guides/lora.rst — ``is_lora`` / ``lora_rank`` /
``lora_path`` on the actor model, auto-targeting qkv/proj/fc layers;
openpi's per-layer LoRA in models/embodiment/openpi_pytorch/pi0_model/lora.py).

TPU-native design: the decoder's params are stacked per-layer
(``blocks["wq"]: [L, d, q]``, models/llm/model.py init_params), so one LoRA
adapter per target is a PAIR of stacked low-rank factors
``a: [L, in, r], b: [L, r, out]`` and the merge is a single einsum per
target across all layers — no module surgery, no per-layer Python loops.
Training differentiates the loss w.r.t. the (tiny) LoRA tree only, with the
frozen base params passed as a runtime argument (never baked into the jit
as constants); the merge materializes effective weights inside the step
where XLA fuses the rank-r matmul + add into the consumer matmuls'
producers under remat.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.llm.config import LLMConfig

Params = Dict[str, Any]

# every 2D-per-layer matmul weight in the dense decoder; "lm_head" may be
# added as an extra target (peft's optional lm_head target module) — it
# adapts the output projection even for tied-embedding models (the merged
# tree gains an explicit "lm_head" leaf that lm_head_weight prefers).
DEFAULT_TARGETS: Tuple[str, ...] = (
    "wq", "wk", "wv", "wo", "gate", "up", "down",
)


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    """Mirrors the reference's YAML surface (lora.rst: is_lora, lora_rank,
    lora_path) plus the standard alpha scaling."""

    enabled: bool = False
    rank: int = 16
    alpha: float = 32.0
    targets: Tuple[str, ...] = DEFAULT_TARGETS
    path: str = ""          # pre-trained adapter checkpoint ('' = fresh)

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def init_lora_params(
    cfg: LLMConfig, lora_cfg: LoRAConfig, rng: jax.Array
) -> Params:
    """Fresh adapters: a ~ N(0, 1/d_in) (Kaiming-style fan-in init, the
    standard LoRA init — Hu et al. 2021), b = 0 (so the merged model starts
    exactly at the base model). Scaling by 1/sqrt(rank) instead of fan-in
    makes the delta per unit-b ~sqrt(d_in/r) times too large and Adam blows
    the adapters into saturation at normal learning rates."""
    L = cfg.num_layers
    dims = {
        "wq": (cfg.hidden_size, cfg.q_dim),
        "wk": (cfg.hidden_size, cfg.kv_dim),
        "wv": (cfg.hidden_size, cfg.kv_dim),
        "wo": (cfg.q_dim, cfg.hidden_size),
        "gate": (cfg.hidden_size, cfg.intermediate_size),
        "up": (cfg.hidden_size, cfg.intermediate_size),
        "down": (cfg.intermediate_size, cfg.hidden_size),
    }
    r = lora_cfg.rank
    out: Params = {"blocks": {}}
    keys = jax.random.split(rng, len(lora_cfg.targets))
    for key, name in zip(keys, lora_cfg.targets):
        if name == "lm_head":
            # unstacked [D, V] output projection (works for tied embeddings
            # too: the merge materializes an explicit lm_head leaf)
            out["lm_head"] = {
                "a": (jax.random.normal(
                        key, (cfg.hidden_size, r), jnp.float32)
                      / jnp.sqrt(cfg.hidden_size)).astype(cfg.compute_dtype),
                "b": jnp.zeros((r, cfg.vocab_size), cfg.compute_dtype),
            }
            continue
        if name not in dims:
            raise KeyError(
                f"unknown LoRA target {name!r}; have "
                f"{sorted(dims) + ['lm_head']}"
            )
        d_in, d_out = dims[name]
        out["blocks"][name] = {
            "a": (jax.random.normal(key, (L, d_in, r), jnp.float32)
                  / jnp.sqrt(d_in)).astype(cfg.compute_dtype),
            "b": jnp.zeros((L, r, d_out), cfg.compute_dtype),
        }
    return out


def merge_lora(base_params: Params, lora_params: Params,
               lora_cfg: LoRAConfig) -> Params:
    """Effective params: W_eff = W + scaling * (a @ b), per target, all
    layers in one einsum. Non-target leaves pass through untouched."""
    merged_blocks = dict(base_params["blocks"])
    for name, ab in lora_params["blocks"].items():
        w = base_params["blocks"][name]
        delta = jnp.einsum(
            "lir,lro->lio",
            ab["a"].astype(jnp.float32),
            ab["b"].astype(jnp.float32),
        ) * lora_cfg.scaling
        merged_blocks[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    merged = dict(base_params)
    merged["blocks"] = merged_blocks
    if "lm_head" in lora_params:
        ab = lora_params["lm_head"]
        w = base_params.get("lm_head")
        if w is None:
            w = base_params["embed"].T  # tied embeddings
        delta = (
            ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)
        ) * lora_cfg.scaling
        merged["lm_head"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return merged


def lora_num_params(lora_params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(lora_params))
