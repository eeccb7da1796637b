"""HF checkpoint import: transformers state dict -> stacked-layer param pytree.

TPU-native analog of the reference's HF->Megatron checkpoint converter
(reference rlinf/utils/ckpt_convertor/megatron_convertor/convert_hf_to_mg.py,
invoked from runners/reasoning_runner.py:229-236). Here conversion is a pure
relayout: HF per-layer tensors are stacked along a leading [L, ...] axis and
linear weights transposed to (in, out) for right-multiplication.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from rlinf_tpu.models.llm.config import LLMConfig


def _to_np(t) -> np.ndarray:
    """Accept torch tensors or numpy arrays."""
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, dtype=np.float32)


def params_from_hf_state_dict(
    state_dict: Mapping[str, object],
    cfg: LLMConfig,
) -> Dict:
    """Convert a HF Qwen2/Llama ``model.state_dict()`` to our param layout.

    HF linear weights are stored [out, in]; ours are [in, out] (x @ w).
    """
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    dt = cfg.compute_dtype
    L = cfg.num_layers

    def lin(name: str, layer: int) -> np.ndarray:
        return _to_np(sd[f"layers.{layer}.{name}.weight"]).T  # [in, out]

    def vec(name: str, layer: int) -> np.ndarray:
        return _to_np(sd[f"layers.{layer}.{name}"])

    def stack(fn):
        return jnp.asarray(np.stack([fn(i) for i in range(L)]), dtype=dt)

    blocks = {
        "attn_norm": stack(lambda i: vec("input_layernorm.weight", i)),
        "wq": stack(lambda i: lin("self_attn.q_proj", i)),
        "wk": stack(lambda i: lin("self_attn.k_proj", i)),
        "wv": stack(lambda i: lin("self_attn.v_proj", i)),
        "wo": stack(lambda i: lin("self_attn.o_proj", i)),
        "mlp_norm": stack(lambda i: vec("post_attention_layernorm.weight", i)),
        "gate": stack(lambda i: lin("mlp.gate_proj", i)),
        "up": stack(lambda i: lin("mlp.up_proj", i)),
        "down": stack(lambda i: lin("mlp.down_proj", i)),
    }
    if cfg.qkv_bias:
        blocks["bq"] = stack(lambda i: vec("self_attn.q_proj.bias", i))
        blocks["bk"] = stack(lambda i: vec("self_attn.k_proj.bias", i))
        blocks["bv"] = stack(lambda i: vec("self_attn.v_proj.bias", i))

    params = {
        "embed": jnp.asarray(_to_np(sd["embed_tokens.weight"]), dtype=dt),
        "blocks": blocks,
        "final_norm": jnp.asarray(_to_np(sd["norm.weight"]), dtype=dt),
    }
    if not cfg.tie_word_embeddings:
        # lm_head lives outside the "model." prefix in HF checkpoints.
        lm = state_dict.get("lm_head.weight", sd.get("lm_head.weight"))
        params["lm_head"] = jnp.asarray(_to_np(lm).T, dtype=dt)
    return params


def load_hf_pretrained(model_name_or_path: str, dtype: str = "bfloat16"):
    """Load a HF causal-LM checkpoint from local disk into (cfg, params).

    Requires the checkpoint to be present locally (zero-egress environments).
    """
    import transformers

    hf_cfg = transformers.AutoConfig.from_pretrained(model_name_or_path)
    cfg = LLMConfig.from_hf_config(hf_cfg)
    cfg = LLMConfig(**{**cfg.__dict__, "dtype": dtype})
    model = transformers.AutoModelForCausalLM.from_pretrained(
        model_name_or_path, torch_dtype="float32"
    )
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    return cfg, params
