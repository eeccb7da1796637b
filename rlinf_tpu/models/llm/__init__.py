"""Decoder-only LLM: config, params, forward, KV-cache sampler, HF import."""

from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.model import (
    KVCache,
    forward_hidden,
    forward_logits,
    init_kv_cache,
    init_params,
    lm_head_weight,
    partition_rules,
    prefill,
    decode_step,
    decode_step_packed,
    decode_step_packed_q8,
    init_kv_cache_packed,
    init_kv_cache_packed_q8,
    packed_cache_from_stacked,
    lm_head_logits,
)
from rlinf_tpu.models.llm.quant import QTensor, quantize_params
from rlinf_tpu.models.llm.sampler import (
    GenerateOutput,
    SamplingParams,
    generate,
    sample_from_logits,
)
from rlinf_tpu.models.llm.hf_import import params_from_hf_state_dict

__all__ = [
    "LLMConfig",
    "KVCache",
    "forward_hidden",
    "forward_logits",
    "init_kv_cache",
    "init_params",
    "lm_head_weight",
    "partition_rules",
    "prefill",
    "decode_step",
    "decode_step_packed",
    "decode_step_packed_q8",
    "init_kv_cache_packed",
    "init_kv_cache_packed_q8",
    "packed_cache_from_stacked",
    "lm_head_logits",
    "QTensor",
    "quantize_params",
    "GenerateOutput",
    "SamplingParams",
    "generate",
    "sample_from_logits",
    "params_from_hf_state_dict",
]
