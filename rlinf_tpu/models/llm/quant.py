"""Weight-only int8 quantization for rollout decode.

Decode on TPU is HBM-bandwidth-bound on the WEIGHTS (a 0.5B bf16 model
streams ~1 GB per decoded token-batch); per-channel int8 halves that traffic
while the matmul still runs in bf16 on the MXU (the int8->bf16 upcast fuses
into the matmul read, so the bf16 copy is never materialized in HBM).

RL-correctness: quantized rollout is a slightly-off-policy BEHAVIOR policy.
The GRPO/PPO pipeline already handles behavior != proximal policies — rollout
logprobs enter the loss only through the importance ratio (decoupled-PPO,
reference rlinf/algorithms/losses.py:27 semantics), and logprob recompute for
training runs on the bf16 weights. Reference analog: SGLang/vLLM serve fp8
rollout for RL at scale.

Usage:
    qparams = quantize_params(params)       # int8 QTensor leaves
    generate(params, ..., decode_params=qparams)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """Per-output-channel symmetric int8 weight + fp32 scale.

    q: int8 [..., D_in, D_out]; scale: fp32 [..., 1, D_out].
    """

    q: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


def quantize_tensor(w: jax.Array) -> QTensor:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=s)


def dequantize(w: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for plain arrays or QTensor.

    The scale is per-OUTPUT-channel ([..., 1, D_out]), so
    ``x @ (q * scale) == (x @ q) * scale``: scaling the [B, D_out] result
    keeps the matmul operand a pure int8->dtype convert (which XLA folds
    into the MXU operand load) instead of a convert+broadcast-multiply over
    the whole [D_in, D_out] weight, which XLA may materialize as a bf16
    weight copy every decode step."""
    if isinstance(w, QTensor):
        return (x @ w.q.astype(x.dtype)) * w.scale.astype(x.dtype)
    return x @ w


# Matmul weights of the LLM param tree (everything else — norms, biases,
# embedding gather — stays bf16; quantizing them saves nothing). MoE expert
# weights go through the einsum dispatch path and stay bf16 for now.
_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down", "lm_head")


def quantize_params(params: dict, *, fuse: bool = True) -> dict:
    """LLM params -> same tree with matmul weights as int8 QTensor leaves.

    For tied-embedding models the lm_head matmul reads ``embed.T``; a
    quantized ``lm_head`` entry is materialized so decode never streams the
    bf16 embedding for the output projection (the input-side gather still
    uses the bf16 table).

    ``fuse`` (default): emit FUSED decode weights — ``wqkv`` =
    concat(wq, wk, wv) and ``wgu`` = concat(gate, up) along the output
    axis — replacing the individual entries. Decode at serving batch sizes
    is dominated by per-op fixed cost across layers (measured ~1ms of a
    2.3ms step at B=64 on v5e is neither weights, KV, nor sampling);
    collapsing 5 matmul dispatches per layer to 3 attacks exactly that.
    Per-output-channel scales make the fusion exact: the concatenated
    quantization equals quantizing each part separately.
    """
    out = dict(params)
    blocks = dict(params["blocks"])
    if fuse and all(k in blocks for k in ("wq", "wk", "wv")):
        import jax.numpy as jnp

        blocks["wqkv"] = quantize_tensor(jnp.concatenate(
            [blocks.pop("wq"), blocks.pop("wk"), blocks.pop("wv")], axis=-1
        ))
    if fuse and "gate" in blocks and "up" in blocks:
        import jax.numpy as jnp

        blocks["wgu"] = quantize_tensor(jnp.concatenate(
            [blocks.pop("gate"), blocks.pop("up")], axis=-1
        ))
    for k in list(blocks.keys()):
        if k in _MATMUL_KEYS:
            blocks[k] = quantize_tensor(blocks[k])
    out["blocks"] = blocks
    if "lm_head" in params:
        out["lm_head"] = quantize_tensor(params["lm_head"])
    else:
        out["lm_head"] = quantize_tensor(params["embed"].T)
    return out
