"""Compute kernels: XLA-fused reference implementations + Pallas TPU kernels.

TPU-native replacement for the reference's external native kernels
(SURVEY.md §2.9: TransformerEngine fused attention, liger-kernel fused CE,
flash-attn, Megatron vocab-parallel logprob/entropy at
rlinf/utils/distributed.py:1066-1264).

Every op has an XLA implementation (works on CPU test meshes and is the
autodiff reference) and, where it matters, a Pallas TPU kernel selected at
runtime on TPU backends.
"""

from rlinf_tpu.ops.rope import apply_rope, rope_frequencies
from rlinf_tpu.ops.norm import rms_norm
from rlinf_tpu.ops.attention import causal_attention, decode_attention
from rlinf_tpu.ops.logprobs import (
    logprobs_and_entropy_from_logits,
    token_logprobs_from_logits,
    vocab_parallel_logprobs_and_entropy,
)

__all__ = [
    "apply_rope",
    "rope_frequencies",
    "rms_norm",
    "causal_attention",
    "decode_attention",
    "logprobs_and_entropy_from_logits",
    "token_logprobs_from_logits",
    "vocab_parallel_logprobs_and_entropy",
]
