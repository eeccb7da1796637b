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
    if cfg.qk_norm:   # Qwen3 per-head q/k RMSNorm
        blocks["q_norm"] = stack(lambda i: vec("self_attn.q_norm.weight", i))
        blocks["k_norm"] = stack(lambda i: vec("self_attn.k_norm.weight", i))

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


def params_to_hf_state_dict(params, cfg: LLMConfig) -> Dict[str, "np.ndarray"]:
    """Inverse relayout: our stacked params -> HF Qwen2/Llama state dict
    (numpy). The export half of the reference's checkpoint converters
    (reference utils/ckpt_convertor/). Pass to
    ``model.load_state_dict({k: torch.from_numpy(v) ...})``.
    """
    import numpy as np

    blocks = params["blocks"]
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
    }
    L = cfg.num_layers

    def put(name, arr, transpose=False):
        a = np.asarray(arr, np.float32)
        out[name] = a.T if transpose else a

    for i in range(L):
        p = f"model.layers.{i}."
        put(p + "input_layernorm.weight", blocks["attn_norm"][i])
        put(p + "self_attn.q_proj.weight", blocks["wq"][i], transpose=True)
        put(p + "self_attn.k_proj.weight", blocks["wk"][i], transpose=True)
        put(p + "self_attn.v_proj.weight", blocks["wv"][i], transpose=True)
        put(p + "self_attn.o_proj.weight", blocks["wo"][i], transpose=True)
        put(p + "post_attention_layernorm.weight", blocks["mlp_norm"][i])
        put(p + "mlp.gate_proj.weight", blocks["gate"][i], transpose=True)
        put(p + "mlp.up_proj.weight", blocks["up"][i], transpose=True)
        put(p + "mlp.down_proj.weight", blocks["down"][i], transpose=True)
        if cfg.qkv_bias:
            put(p + "self_attn.q_proj.bias", blocks["bq"][i])
            put(p + "self_attn.k_proj.bias", blocks["bk"][i])
            put(p + "self_attn.v_proj.bias", blocks["bv"][i])
        if cfg.qk_norm:
            put(p + "self_attn.q_norm.weight", blocks["q_norm"][i])
            put(p + "self_attn.k_norm.weight", blocks["k_norm"][i])
    if cfg.tie_word_embeddings:
        # HF state dicts materialize the tied head; mirror that.
        out["lm_head.weight"] = out["model.embed_tokens.weight"]
    else:
        put("lm_head.weight", params["lm_head"], transpose=True)
    return out
