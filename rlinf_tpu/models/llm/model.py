"""Decoder-only transformer (Qwen2/Llama family), pure-functional JAX.

One sharded model serves training, logprob recompute, and rollout decode —
the TPU-native collapse of the reference's Megatron/FSDP-vs-SGLang/vLLM dual
backends (SURVEY.md "What deliberately does NOT carry over").

Design notes (TPU-first):
  * Layer parameters are STACKED along a leading [L, ...] axis and the forward
    runs ``lax.scan`` over layers: one compiled block regardless of depth,
    fast compiles, and XLA pipelines the per-layer collectives.
  * Partition rules follow the Megatron scheme the reference relies on
    (column-parallel in-projections, row-parallel out-projections, vocab-
    sharded embedding/lm_head) but are declarative — XLA SPMD inserts the
    all-reduces (reference does this by hand in Megatron, SURVEY §2.8).
  * All matmuls run in the config compute dtype (bf16 on TPU) with fp32
    softmax/norm statistics; logits always fp32.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rlinf_tpu.ops.attention import causal_attention, decode_attention
from rlinf_tpu.ops.norm import rms_norm
from rlinf_tpu.ops.rope import apply_rope, rope_frequencies
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.quant import QTensor, mm
from rlinf_tpu.parallel.mesh import AxisNames as Ax
from rlinf_tpu.parallel.sharding import with_sharding_constraint as shard_activation

Params = Dict[str, jax.Array]


class KVCache(NamedTuple):
    """Preallocated decode cache: k/v of [L, B, S_max, K, D]."""

    k: jax.Array
    v: jax.Array


# ---------------------------------------------------------------------------
# Partition rules (regex on param path -> PartitionSpec).
# ---------------------------------------------------------------------------

def partition_rules():
    """Megatron-style TP + fsdp sharding for the stacked-layer layout."""
    t, f = Ax.TENSOR, Ax.FSDP
    return [
        (r"embed", P(t, f)),                 # vocab-sharded embedding table
        (r"blocks/wq", P(None, f, t)),       # column parallel [L, D, H*Hd]
        (r"blocks/wk", P(None, f, t)),
        (r"blocks/wv", P(None, f, t)),
        (r"blocks/bq", P(None, t)),
        (r"blocks/bk", P(None, t)),
        (r"blocks/bv", P(None, t)),
        (r"blocks/wo", P(None, t, f)),       # row parallel [L, H*Hd, D]
        (r"blocks/gate", P(None, f, t)),
        (r"blocks/up", P(None, f, t)),
        (r"blocks/down", P(None, t, f)),
        (r"blocks/moe_router", P(None, f, None)),
        (r"blocks/moe_gate", P(None, Ax.EXPERT, f, t)),
        (r"blocks/moe_up", P(None, Ax.EXPERT, f, t)),
        (r"blocks/moe_down", P(None, Ax.EXPERT, t, f)),
        (r"blocks/attn_norm", P(None, None)),
        (r"blocks/mlp_norm", P(None, None)),
        (r"blocks/(q|k)_norm", P(None, None)),
        (r"final_norm", P()),
        (r"lm_head", P(f, t)),               # [D, V] vocab-sharded output
    ]


def init_params(cfg: LLMConfig, rng: jax.Array) -> Params:
    """Random init matching HF Qwen2 scheme (normal(0.02), ones norms)."""
    dt = cfg.compute_dtype
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    qd, kvd = cfg.q_dim, cfg.kv_dim
    keys = jax.random.split(rng, 10)

    def norm_init(key, shape):
        return jax.random.normal(key, shape, jnp.float32).astype(dt) * 0.02

    blocks: Params = {
        "attn_norm": jnp.ones((l, d), dt),
        "wq": norm_init(keys[1], (l, d, qd)),
        "wk": norm_init(keys[2], (l, d, kvd)),
        "wv": norm_init(keys[3], (l, d, kvd)),
        "wo": norm_init(keys[4], (l, qd, d)),
        "mlp_norm": jnp.ones((l, d), dt),
    }
    if cfg.is_moe:
        e = cfg.num_experts
        moe_keys = jax.random.split(keys[5], 4)
        blocks["moe_router"] = norm_init(moe_keys[0], (l, d, e))
        blocks["moe_gate"] = norm_init(moe_keys[1], (l, e, d, f))
        blocks["moe_up"] = norm_init(moe_keys[2], (l, e, d, f))
        blocks["moe_down"] = norm_init(moe_keys[3], (l, e, f, d))
    else:
        blocks["gate"] = norm_init(keys[5], (l, d, f))
        blocks["up"] = norm_init(keys[6], (l, d, f))
        blocks["down"] = norm_init(keys[7], (l, f, d))
    params: Params = {
        "embed": norm_init(keys[0], (cfg.vocab_size, d)),
        "blocks": blocks,
        "final_norm": jnp.ones((d,), dt),
    }
    if cfg.qkv_bias:
        params["blocks"]["bq"] = jnp.zeros((l, qd), dt)
        params["blocks"]["bk"] = jnp.zeros((l, kvd), dt)
        params["blocks"]["bv"] = jnp.zeros((l, kvd), dt)
    if cfg.qk_norm:
        # Qwen3-style per-head RMSNorm on q/k before RoPE
        params["blocks"]["q_norm"] = jnp.ones((l, cfg.head_dim_), dt)
        params["blocks"]["k_norm"] = jnp.ones((l, cfg.head_dim_), dt)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm_init(keys[8], (d, cfg.vocab_size))
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _project_qkv(cfg: LLMConfig, layer: Params, h: jax.Array, B: int, S: int):
    """qkv projection + bias + head reshape + optional Qwen3 qk-norm.
    h: [B, S, D] → q [B,S,H,Hd], k/v [B,S,K,Hd] (pre-RoPE)."""
    Hd = cfg.head_dim_
    if "wqkv" in layer:
        # fused decode weights (quant.py quantize_params(fuse=True)): one
        # matmul dispatch instead of three — per-op fixed cost dominates
        # decode at serving batch sizes
        qkv = mm(h, layer["wqkv"])
        qd, kd = cfg.q_dim, cfg.kv_dim
        q = qkv[..., :qd]
        k = qkv[..., qd:qd + kd]
        v = qkv[..., qd + kd:]
    else:
        q = mm(h, layer["wq"])
        k = mm(h, layer["wk"])
        v = mm(h, layer["wv"])
    if cfg.qkv_bias:
        q = q + layer["bq"]
        k = k + layer["bk"]
        v = v + layer["bv"]
    q = q.reshape(B, S, cfg.num_heads, Hd)
    k = k.reshape(B, S, cfg.num_kv_heads, Hd)
    v = v.reshape(B, S, cfg.num_kv_heads, Hd)
    if cfg.qk_norm:
        q = rms_norm(q, layer["q_norm"], cfg.rms_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_eps)
    return q, k, v


def _mlp_or_moe(cfg: LLMConfig, x, layer):
    """Dense SwiGLU MLP or MoE block, residual included. Returns (x, aux)."""
    h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
    if cfg.is_moe:
        from rlinf_tpu.ops.moe import moe_layer

        moe_params = {
            "router": layer["moe_router"],
            "gate": layer["moe_gate"],
            "up": layer["moe_up"],
            "down": layer["moe_down"],
        }
        out, aux = moe_layer(moe_params, h, cfg.moe_config)
        return x + out, aux
    if "wgu" in layer:
        gu = mm(h, layer["wgu"])
        F = gu.shape[-1] // 2
        gated = jax.nn.silu(gu[..., :F]) * gu[..., F:]
    else:
        gated = jax.nn.silu(mm(h, layer["gate"])) * mm(h, layer["up"])
    return x + mm(gated, layer["down"]), jnp.zeros((), jnp.float32)


def _block(
    cfg: LLMConfig,
    x: jax.Array,
    layer: Params,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    kv_valid_mask: Optional[jax.Array],
    attn_impl: str,
    mask_positions: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One transformer block. Returns (x_out, (k, v)) with k/v [B,S,K,D].

    mask_positions: optional [B, S] ints used for the causality test instead
    of ``positions`` (RoPE still uses ``positions``). Enables prefix-LM /
    block-causal masks: tokens sharing a mask position attend bidirectionally
    (pi0-style [prefix | state | action] blocks).
    """
    B, S, D = x.shape
    Hd = cfg.head_dim_

    h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    q, k, v = _project_qkv(cfg, layer, h, B, S)
    q, k = apply_rope(q, k, cos, sin, positions)

    mpos = positions if mask_positions is None else mask_positions
    attn = causal_attention(
        q, k, v,
        positions_q=mpos,
        positions_kv=mpos,
        kv_valid_mask=kv_valid_mask,
        impl=attn_impl,
    )
    x = x + mm(attn.reshape(B, S, cfg.q_dim), layer["wo"])

    x, aux = _mlp_or_moe(cfg, x, layer)
    return x, (k, v), aux


def forward_hidden(
    params: Params,
    cfg: LLMConfig,
    input_ids: Optional[jax.Array],
    positions: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    *,
    inputs_embeds: Optional[jax.Array] = None,
    mask_positions: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    return_kv: bool = False,
    remat: bool = False,
    return_aux: bool = False,
    unroll_layers: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Token ids -> final hidden states [B, S, D] (pre-lm_head).

    attention_mask: [B, S] bool, False = padding (left or right).
    inputs_embeds: [B, S, D] — bypasses the embedding lookup (multimodal
      prefixes: image patch embeddings spliced before text, the prismatic /
      PaliGemma pattern of the reference's VLA backbones).
    mask_positions: [B, S] ints for the causality test only (see _block) —
      prefix-LM / block-causal attention.
    return_aux: also return the summed MoE auxiliary (load-balance) loss.
    """
    B, S = (input_ids.shape if inputs_embeds is None else inputs_embeds.shape[:2])
    if positions is None:
        if attention_mask is not None:
            positions = jnp.maximum(
                jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0
            )
        else:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))

    cos, sin = rope_frequencies(cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    if inputs_embeds is None:
        x = params["embed"][input_ids].astype(cfg.compute_dtype)
    else:
        x = inputs_embeds.astype(cfg.compute_dtype)
    if attn_impl == "ring":
        # context parallelism: activations + positions sharded on sequence
        # (reference Megatron CP + SP, SURVEY.md §5.7)
        x = shard_activation(x, P(Ax.BATCH, Ax.CONTEXT, None))
        positions = shard_activation(positions, P(Ax.BATCH, Ax.CONTEXT))
        if attention_mask is not None:
            attention_mask = shard_activation(
                attention_mask, P(Ax.BATCH, Ax.CONTEXT)
            )
    else:
        x = shard_activation(x, P(Ax.BATCH, None, None))

    block_fn = lambda x, layer: _block(
        cfg, x, layer, cos, sin, positions, attention_mask, attn_impl,
        mask_positions,
    )
    if remat == "full" or remat is True:
        block_fn = jax.checkpoint(block_fn)
    elif remat == "dots":
        # Selective rematerialization: keep matmul outputs, recompute the
        # cheap elementwise/norm ops — near-zero extra FLOPs vs full remat's
        # +1 forward (trades ~half the activation-memory win).
        block_fn = jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    if unroll_layers:
        # Python-unrolled layer loop: the scan form makes XLA's backward
        # hoist loop-invariant TRANSPOSES of the whole stacked weight
        # tensors out of the loop (measured: several 1.2GB copies at
        # Gemma-2B geometry -> ~8GB bwd workspace); unrolled, each layer's
        # dgrad transposes a single 64MB slice and frees it.
        aux_sum = jnp.zeros((), jnp.float32)
        kv_list = []
        for i in range(cfg.num_layers):
            layer = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x, kv, aux = block_fn(x, layer)
            aux_sum = aux_sum + aux
            if return_kv:
                kv_list.append(kv)
        kvs = (
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *kv_list)
            if return_kv else None
        )
    else:
        def scan_fn(carry, layer):
            x, aux_sum = carry
            x, kv, aux = block_fn(x, layer)
            return (x, aux_sum + aux), kv if return_kv else None

        (x, aux_sum), kvs = jax.lax.scan(
            scan_fn, (x, jnp.zeros((), jnp.float32)), params["blocks"]
        )
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    cache = KVCache(k=kvs[0], v=kvs[1]) if return_kv else None
    if return_aux:
        return x, cache, aux_sum
    return x, cache


def lm_head_weight(params: Params, cfg: LLMConfig) -> jax.Array:
    if "lm_head" in params:
        return params["lm_head"]
    return params["embed"].T


def lm_head_logits(params: Params, cfg: LLMConfig, hidden: jax.Array) -> jax.Array:
    """hidden [..., D] -> fp32 logits [..., V]; handles QTensor lm_head."""
    w = lm_head_weight(params, cfg)
    if isinstance(w, QTensor):
        return mm(hidden, w).astype(jnp.float32)
    return jnp.einsum(
        "...d,dv->...v", hidden, w, preferred_element_type=jnp.float32
    )


def forward_logits(
    params: Params,
    cfg: LLMConfig,
    input_ids: jax.Array,
    positions: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    **kw,
) -> jax.Array:
    """Full-vocab fp32 logits [B, S, V]. Prefer the fused logprob ops for
    training — this materializes the logits tensor."""
    hidden, _ = forward_hidden(params, cfg, input_ids, positions, attention_mask, **kw)
    return lm_head_logits(params, cfg, hidden)


# ---------------------------------------------------------------------------
# Decode path (KV cache)
# ---------------------------------------------------------------------------

def init_kv_cache(cfg: LLMConfig, batch: int, max_len: int) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim_)
    dt = cfg.compute_dtype
    return KVCache(k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt))


def prefill(
    params: Params,
    cfg: LLMConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    max_cache_len: int,
    *,
    attn_impl: str = "xla",
) -> Tuple[jax.Array, KVCache]:
    """Run the prompt through the model, returning last-position hidden state
    [B, D] and a KV cache padded to ``max_cache_len``.

    Prompts are LEFT-padded so every sequence's last token sits at index S-1;
    cache slots [0, S) are the (masked) prompt, decode appends at S.
    """
    B, S = input_ids.shape
    assert max_cache_len >= S
    hidden, kv = forward_hidden(
        params, cfg, input_ids, attention_mask=attention_mask,
        attn_impl=attn_impl, return_kv=True,
    )
    pad = max_cache_len - S
    k = jnp.pad(kv.k, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    v = jnp.pad(kv.v, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    return hidden[:, -1, :], KVCache(k=k, v=v)


def decode_step(
    params: Params,
    cfg: LLMConfig,
    token_ids: jax.Array,      # [B] current input token
    cache: KVCache,
    cache_index: jax.Array,    # scalar: write slot (prompt_len + step)
    positions: jax.Array,      # [B] rope position of this token
    kv_valid: jax.Array,       # [B, S_max] bool, True incl. this token's slot
) -> Tuple[jax.Array, KVCache]:
    """One decode step for the whole batch. Returns ([B, D] hidden, cache)."""
    B = token_ids.shape[0]
    Hd = cfg.head_dim_
    cos, sin = rope_frequencies(cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    x = params["embed"][token_ids][:, None, :].astype(cfg.compute_dtype)  # [B,1,D]
    pos = positions[:, None]  # [B, 1]

    def scan_fn(x, inputs):
        layer, k_cache_l, v_cache_l = inputs
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(cfg, layer, h, B, 1)
        q, k = apply_rope(q, k, cos, sin, pos)

        k_cache_l = jax.lax.dynamic_update_slice(
            k_cache_l, k, (0, cache_index, 0, 0)
        )
        v_cache_l = jax.lax.dynamic_update_slice(
            v_cache_l, v, (0, cache_index, 0, 0)
        )
        attn = decode_attention(q, k_cache_l, v_cache_l, kv_valid)
        x = x + mm(attn.reshape(B, 1, cfg.q_dim), layer["wo"])
        x, _ = _mlp_or_moe(cfg, x, layer)
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(scan_fn, x, (params["blocks"], cache.k, cache.v))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x[:, 0, :], KVCache(k=new_k, v=new_v)


def decode_step_ragged(
    params: Params,
    cfg: LLMConfig,
    token_ids: jax.Array,      # [B] current input token per slot
    cache: KVCache,
    write_pos: jax.Array,      # [B] PER-SLOT cache write index
    positions: jax.Array,      # [B] rope position of this token
    kv_valid: jax.Array,       # [B, S_max] bool incl. this token's slot
) -> Tuple[jax.Array, KVCache]:
    """Decode step where every batch row writes its kv at its OWN cache index
    (continuous batching: slots hold sequences of different lengths).
    Row-wise scatter via ``.at[arange(B), write_pos]``."""
    B = token_ids.shape[0]
    Hd = cfg.head_dim_
    cos, sin = rope_frequencies(cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    x = params["embed"][token_ids][:, None, :].astype(cfg.compute_dtype)
    pos = positions[:, None]
    rows = jnp.arange(B)

    def scan_fn(x, inputs):
        layer, k_cache_l, v_cache_l = inputs
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(cfg, layer, h, B, 1)
        q, k = apply_rope(q, k, cos, sin, pos)

        k_cache_l = k_cache_l.at[rows, write_pos].set(k[:, 0])
        v_cache_l = v_cache_l.at[rows, write_pos].set(v[:, 0])
        attn = decode_attention(q, k_cache_l, v_cache_l, kv_valid)
        x = x + mm(attn.reshape(B, 1, cfg.q_dim), layer["wo"])
        x, _ = _mlp_or_moe(cfg, x, layer)
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(scan_fn, x, (params["blocks"], cache.k, cache.v))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x[:, 0, :], KVCache(k=new_k, v=new_v)


# ---------------------------------------------------------------------------
# Packed decode path (the fast one)
# ---------------------------------------------------------------------------
#
# Cache layout [B, S_max, Kv*Hd] per layer: the packed minor dim is a whole
# number of 128-lane tiles (Qwen2-0.5B: 2*64 = 128), where [B, S, Kv, Hd]
# pads (Kv, Hd) up to the bf16 (16, 128) tile — measured 16x physical HBM
# blowup on the real chip. Attention reads the packed layout directly via
# the Pallas kernel (ops/pallas/decode_attention.py); layers are unrolled so
# the per-layer cache buffers are loop-carried and updated in place.

PackedKVLayers = Tuple[Tuple[jax.Array, jax.Array], ...]


def init_kv_cache_packed(cfg: LLMConfig, batch: int, max_len: int) -> PackedKVLayers:
    """Tuple of per-layer (k, v), each [B, S_max, Kv*Hd]."""
    shape = (batch, max_len, cfg.kv_dim)
    dt = cfg.compute_dtype
    return tuple(
        (jnp.zeros(shape, dt), jnp.zeros(shape, dt))
        for _ in range(cfg.num_layers)
    )


def packed_cache_from_stacked(cache: KVCache) -> PackedKVLayers:
    """KVCache [L,B,S,K,D] -> per-layer packed (k, v) [B,S,K*D]."""
    L, B, S = cache.k.shape[:3]
    kd = cache.k.shape[3] * cache.k.shape[4]
    return tuple(
        (cache.k[i].reshape(B, S, kd), cache.v[i].reshape(B, S, kd))
        for i in range(L)
    )


def default_decode_attn_impl() -> str:
    """Pallas on TPU, XLA reference elsewhere (same semantics)."""
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _decode_block_config(S: int, KD: int):
    """(block_size, block_rows) for the packed decode kernel.

    One block per cache row when it fits: fewer grid steps beat
    partial-length DMA skipping at serving sizes; block_rows=4 at 512-wide
    blocks measured 602us vs 700us for 8 rows (v5e, B=64, S=512, KD=128).
    Wide-KD models (e.g. Kv=8, Hd=128 -> KD=1024) must shrink the block to
    stay inside VMEM — blocks over ~2MB fail to compile on v5e (verified:
    KD=1024 dies at 512x4 and 512x2, works at 256x2).
    """
    blk = S if S <= 512 else 512
    rows = 4 if blk >= 512 else 8
    budget = 2 << 20                       # bytes per kv operand block
    while rows > 2 and rows * blk * KD * 2 > budget:
        rows //= 2
    while blk > 128 and rows * blk * KD * 2 > budget:
        blk //= 2
    return blk, rows


def _packed_decode_attn(
    q: jax.Array,          # [B, H, Hd]
    kc: jax.Array,         # [B, S, K*Hd]
    vc: jax.Array,
    starts: jax.Array,     # [B]
    lengths: jax.Array,    # [B]
    num_kv: int,
    impl: str,
) -> jax.Array:
    from rlinf_tpu.ops.pallas.decode_attention import (
        decode_attention_packed,
        decode_attention_packed_xla,
    )

    if impl == "pallas":
        blk, rows = _decode_block_config(kc.shape[1], kc.shape[2])
        return decode_attention_packed(
            q, kc, vc, starts, lengths, num_kv=num_kv, block_size=blk,
            block_rows=rows,
        )
    return decode_attention_packed_xla(
        q, kc, vc, starts, lengths, num_kv=num_kv
    )


def decode_step_packed(
    params: Params,
    cfg: LLMConfig,
    token_ids: jax.Array,       # [B] current input token per row
    kv_layers: PackedKVLayers,
    write_pos,                  # scalar or [B]: cache slot for this token's kv
    positions: jax.Array,       # [B] rope position of this token
    starts: jax.Array,          # [B] first valid cache slot
    lengths: jax.Array,         # [B] end of valid interval INCLUDING this slot
    *,
    attn_impl: Optional[str] = None,
) -> Tuple[jax.Array, PackedKVLayers]:
    """One decode step on the packed cache. Returns ([B, D] hidden, cache).

    ``write_pos`` may be a traced scalar (static engine: every row writes the
    same slot — lowers to a cheap dynamic_update_slice) or a [B] vector
    (continuous batching: per-row ragged slots -> row scatter).
    """
    B = token_ids.shape[0]
    impl = attn_impl or default_decode_attn_impl()
    kd = cfg.kv_dim
    cos, sin = rope_frequencies(cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    x = params["embed"][token_ids][:, None, :].astype(cfg.compute_dtype)
    pos = positions[:, None]
    uniform_slot = jnp.ndim(write_pos) == 0
    if not uniform_slot:
        rows = jnp.arange(B)

    new_layers = []
    for i, (kc, vc) in enumerate(kv_layers):
        layer = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(cfg, layer, h, B, 1)
        q, k = apply_rope(q, k, cos, sin, pos)
        if uniform_slot:
            kc = jax.lax.dynamic_update_slice(
                kc, k.reshape(B, 1, kd), (0, write_pos, 0)
            )
            vc = jax.lax.dynamic_update_slice(
                vc, v.reshape(B, 1, kd), (0, write_pos, 0)
            )
        else:
            kc = kc.at[rows, write_pos].set(k.reshape(B, kd))
            vc = vc.at[rows, write_pos].set(v.reshape(B, kd))
        attn = _packed_decode_attn(
            q.reshape(B, cfg.num_heads, cfg.head_dim_), kc, vc,
            starts, lengths, cfg.num_kv_heads, impl,
        )
        x = x + mm(attn.reshape(B, 1, cfg.q_dim), layer["wo"])
        x, _ = _mlp_or_moe(cfg, x, layer)
        new_layers.append((kc, vc))

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x[:, 0, :], tuple(new_layers)


# ---------------------------------------------------------------------------
# Layered decode path (in-place cache)
# ---------------------------------------------------------------------------
#
# ``decode_step`` scans over layers with cache.k/v as scan xs/ys, which
# forces XLA to materialize fresh cache arrays every step (~2x cache traffic
# at decode time). The layered path keeps the cache as a TUPLE of per-layer
# arrays carried through the token loop: updates are row-wise scatters on
# loop-carried buffers, which XLA performs in place. The layer loop is
# unrolled (L static slices of the stacked params are loop-invariant and
# hoisted), trading compile time for the memory-bound win.

def layered_cache_from_stacked(cache: KVCache):
    """KVCache [L,B,S,K,D] -> tuple of (k_i, v_i) per layer."""
    L = cache.k.shape[0]
    return tuple((cache.k[i], cache.v[i]) for i in range(L))


def decode_step_layered(
    params: Params,
    cfg: LLMConfig,
    token_ids: jax.Array,      # [B]
    kv_layers,                 # tuple of (k [B,S,K,D], v [B,S,K,D])
    write_pos: jax.Array,      # [B] per-row cache write index
    positions: jax.Array,      # [B] rope position
    kv_valid: jax.Array,       # [B, S_max]
):
    """One decode step with in-place per-layer cache buffers.
    Returns ([B, D] hidden, new kv_layers tuple)."""
    B = token_ids.shape[0]
    Hd = cfg.head_dim_
    cos, sin = rope_frequencies(cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    x = params["embed"][token_ids][:, None, :].astype(cfg.compute_dtype)
    pos = positions[:, None]
    rows = jnp.arange(B)

    new_layers = []
    for i, (k_cache_l, v_cache_l) in enumerate(kv_layers):
        layer = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(cfg, layer, h, B, 1)
        q, k = apply_rope(q, k, cos, sin, pos)

        k_cache_l = k_cache_l.at[rows, write_pos].set(k[:, 0])
        v_cache_l = v_cache_l.at[rows, write_pos].set(v[:, 0])
        attn = decode_attention(q, k_cache_l, v_cache_l, kv_valid)
        x = x + mm(attn.reshape(B, 1, cfg.q_dim), layer["wo"])
        x, _ = _mlp_or_moe(cfg, x, layer)
        new_layers.append((k_cache_l, v_cache_l))

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x[:, 0, :], tuple(new_layers)


# ---------------------------------------------------------------------------
# int8 KV cache decode (serving: cache bytes halve; see
# ops/pallas/decode_attention.py q8 section)
# ---------------------------------------------------------------------------

PackedKVQ8Layers = Tuple[Tuple[jax.Array, jax.Array, jax.Array, jax.Array], ...]


def init_kv_cache_packed_q8(
    cfg: LLMConfig, batch: int, max_len: int
) -> PackedKVQ8Layers:
    """Per-layer (k int8 [B,S,KD], v int8, k_scale f32 [B,S], v_scale)."""
    shape = (batch, max_len, cfg.kv_dim)
    return tuple(
        (jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
         jnp.ones((batch, max_len), jnp.float32),
         jnp.ones((batch, max_len), jnp.float32))
        for _ in range(cfg.num_layers)
    )


def quantize_packed_kv(k: jax.Array):
    """[..., KD] -> (int8, f32 scale[...]) per token (max-abs / 127)."""
    from rlinf_tpu.ops.pallas.decode_attention import quantize_kv_token

    return quantize_kv_token(k)


def decode_step_packed_q8(
    params: Params,
    cfg: LLMConfig,
    token_ids: jax.Array,
    kv_layers: PackedKVQ8Layers,
    write_pos,
    positions: jax.Array,
    starts: jax.Array,
    lengths: jax.Array,
    *,
    attn_impl: Optional[str] = None,
) -> Tuple[jax.Array, PackedKVQ8Layers]:
    """decode_step_packed on an int8 KV cache: new kv quantize-on-write
    (per-token max-abs scale), attention via the q8 kernel (scales fold into
    score/prob rows — no wide dequant)."""
    from rlinf_tpu.ops.pallas.decode_attention import (
        decode_attention_packed_q8,
        decode_attention_packed_q8_xla,
    )

    B = token_ids.shape[0]
    impl = attn_impl or default_decode_attn_impl()
    kd = cfg.kv_dim
    cos, sin = rope_frequencies(cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    x = params["embed"][token_ids][:, None, :].astype(cfg.compute_dtype)
    pos = positions[:, None]
    uniform_slot = jnp.ndim(write_pos) == 0
    if not uniform_slot:
        rows = jnp.arange(B)

    new_layers = []
    for i, (kc, vc, ksc, vsc) in enumerate(kv_layers):
        layer = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q, k, v = _project_qkv(cfg, layer, h, B, 1)
        q, k = apply_rope(q, k, cos, sin, pos)
        kq, ks = quantize_packed_kv(k.reshape(B, kd))
        vq, vs = quantize_packed_kv(v.reshape(B, kd))
        if uniform_slot:
            kc = jax.lax.dynamic_update_slice(
                kc, kq[:, None, :], (0, write_pos, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, vq[:, None, :], (0, write_pos, 0))
            ksc = jax.lax.dynamic_update_slice(
                ksc, ks[:, None], (0, write_pos))
            vsc = jax.lax.dynamic_update_slice(
                vsc, vs[:, None], (0, write_pos))
        else:
            kc = kc.at[rows, write_pos].set(kq)
            vc = vc.at[rows, write_pos].set(vq)
            ksc = ksc.at[rows, write_pos].set(ks)
            vsc = vsc.at[rows, write_pos].set(vs)
        qh = q.reshape(B, cfg.num_heads, cfg.head_dim_)
        if impl == "pallas":
            # NB: local names must not clobber the ragged-path `rows`
            # (= arange(B) row indices) used by the next layer's scatter
            blk, blk_rows = _decode_block_config(kc.shape[1], kc.shape[2])
            attn = decode_attention_packed_q8(
                qh, kc, vc, ksc, vsc, starts, lengths,
                num_kv=cfg.num_kv_heads, block_size=blk,
                block_rows=blk_rows,
            )
        else:
            attn = decode_attention_packed_q8_xla(
                qh, kc, vc, ksc, vsc, starts, lengths,
                num_kv=cfg.num_kv_heads,
            )
        x = x + mm(attn.reshape(B, 1, cfg.q_dim), layer["wo"])
        x, _ = _mlp_or_moe(cfg, x, layer)
        new_layers.append((kc, vc, ksc, vsc))

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x[:, 0, :], tuple(new_layers)
