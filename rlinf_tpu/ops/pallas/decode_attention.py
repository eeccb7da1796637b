"""Packed-layout decode attention (Pallas TPU kernel + XLA reference).

Decode is HBM-bandwidth-bound, so the KV cache layout IS the optimization:

  * KV is stored PACKED as [B, S_max, Kv*Hd]. For GQA models with few kv
    heads (Qwen2-0.5B: Kv=2, Hd=64 -> 128 lanes) this is a perfect lane
    tile; the naive [B, S, Kv, Hd] layout pads its last two dims to the
    bf16 (16, 128) tile -> up to 16x physical HBM blowup and traffic.
  * One program per (row, key-block); the kernel streams only the blocks
    inside the row's valid interval [start, length). Out-of-range grid
    steps clamp their BlockSpec index to the previous block — Mosaic
    elides the repeated DMA — so HBM traffic is proportional to ACTUAL
    sequence lengths, not the padded S_max (the reference gets this from
    SGLang/FlashInfer paged kernels, SURVEY.md §2.9).
  * Online softmax (running max / normalizer / accumulator in VMEM
    scratch across the sequentially-executed block dimension).
  * Both kv heads of a block are attended by ONE program (the packed
    block holds all kv heads), so each cache byte is DMA'd exactly once.

Valid interval semantics: slot s of row b participates iff
``start[b] <= s < length[b]`` — supports left-padded prompts (static
engine: valid = [P - plen, P + t)) and right-aligned-from-0 continuous
slots (start = 0) with one kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0**30


def _kernel(
    # scalar prefetch
    starts_ref,     # [B] int32
    lengths_ref,    # [B] int32
    gfirst_ref,     # [B // Rb] int32 (index-map only)
    glast_ref,      # [B // Rb] int32 (index-map only)
    # blocks
    q_ref,          # [Rb, Hp, KD] — row h*G+g holds head (h,g)'s q in lanes
                    #   [h*Hd, (h+1)*Hd), ZEROS elsewhere (see caller)
    k_ref,          # [Rb, BLK, KD]
    v_ref,          # [Rb, BLK, KD]
    out_ref,        # [Rb, Hp, KD] — packed, caller slices each head's lanes
    # scratch (persist across the block grid dim)
    acc_ref,        # [Rb, Hp, KD] f32
    m_ref,          # [Rb, Hp, 128] f32 (col 0 used)
    l_ref,          # [Rb, Hp, 128] f32
    *,
    block_size: int,
    block_rows: int,
    scale: float,
):
    """All matmuls keep the packed KD lane dim intact — no in-kernel head
    slicing or relayout. Scores: q_packed @ k_block^T — the zero lanes of
    each q row cancel the OTHER kv heads' contributions, so one [Hp, KD] x
    [KD, BLK] dot yields every head's scores. Accumulate: p @ v_block in
    packed form; each head's true output lives in its own lane band (the
    cross-head bands hold junk the caller never reads).

    ``block_rows`` batch rows share one program (unrolled row loop): fewer,
    larger DMAs amortize per-program and per-DMA fixed costs — the single-
    row variant measured ~43% of HBM peak on v5e, multi-row ~2x better."""
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    lo = j * block_size
    for r in range(block_rows):
        b = g * block_rows + r
        start = starts_ref[b]
        length = lengths_ref[b]

        # Block overlaps row b's valid interval [start, length)?
        @pl.when((lo < length) & (lo + block_size > start))
        def _block(r=r, start=start, length=length):
            Hp = q_ref.shape[1]
            q = q_ref[r].astype(jnp.float32)     # [Hp, KD]
            k = k_ref[r].astype(jnp.float32)     # [BLK, KD]
            v = v_ref[r].astype(jnp.float32)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                            # [Hp, BLK]
            pos = lo + jax.lax.broadcasted_iota(
                jnp.int32, (Hp, block_size), 1
            )
            valid = (pos >= start) & (pos < length)
            s = jnp.where(valid, s, NEG_INF)

            m_prev = m_ref[r, :, :1]             # [Hp, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            # Explicit zero on invalid slots: when a whole block (or row)
            # is masked, m_new == NEG_INF and exp(s-m_new) would be 1.
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)   # [Hp, BLK]
            l_new = l_ref[r, :, :1] * alpha + jnp.sum(
                p, axis=1, keepdims=True
            )
            l_ref[r] = jnp.broadcast_to(l_new, l_ref.shape[1:])
            m_ref[r] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            acc_ref[r] = acc_ref[r] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # [Hp, KD]

    @pl.when(j == n_blocks - 1)
    def _finish():
        out_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :, :1], 1e-30)
        ).astype(out_ref.dtype)


def decode_attention_packed(
    q: jax.Array,          # [B, H, Hd] one decode token per row
    k_cache: jax.Array,    # [B, S_max, Kv*Hd] packed
    v_cache: jax.Array,    # [B, S_max, Kv*Hd]
    starts: jax.Array,     # [B] int32 first valid slot
    lengths: jax.Array,    # [B] int32 end of valid interval (exclusive)
    *,
    num_kv: int,
    scale: Optional[float] = None,
    block_size: int = 256,
    block_rows: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, H, Hd] attention output in q.dtype."""
    B, H, Hd = q.shape
    S = k_cache.shape[1]
    KD = num_kv * Hd
    G = H // num_kv
    if scale is None:
        scale = Hd**-0.5
    block_size = min(block_size, S)
    n_blocks = pl.cdiv(S, block_size)
    while B % block_rows:
        block_rows //= 2
    Hp = max(8, H)  # sublane-pad the head dim

    # Pack q: row h*G+g carries head (h,g)'s vector in lanes [h*Hd,(h+1)*Hd),
    # zeros elsewhere — zero lanes cancel other kv heads in the packed dot.
    head = jnp.arange(H) // G                                  # kv head per row
    lane = jnp.arange(KD)
    band = (lane[None, :] >= (head * Hd)[:, None]) & (
        lane[None, :] < ((head + 1) * Hd)[:, None]
    )                                                          # [H, KD]
    q_tiled = jnp.tile(q, (1, 1, num_kv))[:, :, :KD]           # [B, H, KD]
    q_packed = jnp.where(band[None], q_tiled, 0).astype(q.dtype)
    if Hp > H:
        q_packed = jnp.pad(q_packed, ((0, 0), (0, Hp - H), (0, 0)))

    # Per-GROUP valid block bounds (union over the group's rows), computed
    # once outside so the index map is two scalar loads. Out-of-interval
    # grid steps clamp to the previous block index; the repeated index
    # makes Mosaic skip the DMA entirely.
    starts_g = starts.astype(jnp.int32).reshape(-1, block_rows)
    lengths_g = lengths.astype(jnp.int32).reshape(-1, block_rows)
    gfirst = jnp.min(starts_g, axis=1) // block_size
    glast = jnp.maximum(
        (jnp.max(lengths_g, axis=1) + block_size - 1) // block_size - 1, 0
    )

    def q_index(g, j, st, ln, gf, gl):
        return (g, 0, 0)

    def kv_index(g, j, st, ln, gf, gl):
        return (g, jnp.clip(j, gf[g], gl[g]), 0)

    def out_index(g, j, st, ln, gf, gl):
        return (g, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // block_rows, n_blocks),
        in_specs=[
            pl.BlockSpec((block_rows, Hp, KD), q_index),
            pl.BlockSpec((block_rows, block_size, KD), kv_index),
            pl.BlockSpec((block_rows, block_size, KD), kv_index),
        ],
        out_specs=pl.BlockSpec((block_rows, Hp, KD), out_index),
        scratch_shapes=[
            pltpu.VMEM((block_rows, Hp, KD), jnp.float32),
            pltpu.VMEM((block_rows, Hp, 128), jnp.float32),
            pltpu.VMEM((block_rows, Hp, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_size=block_size, block_rows=block_rows,
            scale=scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, KD), q.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), lengths.astype(jnp.int32),
      gfirst, glast, q_packed, k_cache, v_cache)
    # Extract each head's lane band: out[:, h*G+g, h*Hd:(h+1)*Hd]. NOT as a
    # stack of strided lane slices — XLA:TPU miscompiles that pattern under
    # jit on real chips (verified round 3: jitted stack-of-slices epilogue
    # diverges up to 5x relative from the same unpack applied eagerly, for
    # every GQA shape; an optimization_barrier does not help). The diagonal
    # contraction against a tiny identity lowers to one clean reduction and
    # matches the oracle to a bf16 ulp on-chip.
    out4 = out[:, :H].reshape(B, num_kv, G, num_kv, Hd)
    eye = jnp.eye(num_kv, dtype=jnp.float32)
    res = jnp.einsum("bkgjd,kj->bkgd", out4.astype(jnp.float32), eye)
    return res.reshape(B, H, Hd).astype(q.dtype)


def decode_attention_packed_xla(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    starts: jax.Array,
    lengths: jax.Array,
    *,
    num_kv: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """XLA reference with identical semantics (CPU tests / numerics oracle)."""
    B, H, Hd = q.shape
    S = k_cache.shape[1]
    G = H // num_kv
    if scale is None:
        scale = Hd**-0.5
    k = k_cache.reshape(B, S, num_kv, Hd)
    v = v_cache.reshape(B, S, num_kv, Hd)
    qg = q.reshape(B, num_kv, G, Hd)
    s = jnp.einsum("bkgd,bskd->bkgs", qg, k).astype(jnp.float32) * scale
    pos = jnp.arange(S)[None, :]
    valid = (pos >= starts[:, None]) & (pos < lengths[:, None])   # [B, S]
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # Rows with an empty interval produce uniform junk; zero them like the
    # kernel (l == 0 -> acc stays 0).
    p = jnp.where(jnp.any(valid, -1)[:, None, None, None], p, 0.0)
    out = jnp.einsum("bkgs,bskd->bkgd", p.astype(q.dtype), v)
    return out.reshape(B, H, Hd)


# ---------------------------------------------------------------------------
# int8-quantized KV cache variant
# ---------------------------------------------------------------------------
#
# Decode is KV-bandwidth-bound at serving batch sizes (at B=512 the cache is
# ~5x the int8 weight bytes), so the cache itself is stored int8 with one
# fp32 scale per (row, slot): k_vec ≈ k_q * ks. The scales FOLD INTO THE
# SCORE/PROB ROWS instead of dequantizing the KD-wide blocks:
#
#   s = (q @ k^T) * ks[None, :]          (lane-wise on [Hp, BLK])
#   out += (p * vs[None, :]) @ v          (lane-wise on [Hp, BLK])
#
# so the only wide op added is the int8->f32 cast of the block already being
# read — HBM traffic halves, compute is unchanged.

def _kernel_q8(
    # scalar prefetch
    starts_ref, lengths_ref, gfirst_ref, glast_ref,
    # blocks
    q_ref,          # [Rb, Hp, KD]
    k_ref,          # [Rb, BLK, KD] int8
    v_ref,          # [Rb, BLK, KD] int8
    ks_ref,         # [Rb, BLK] f32
    vs_ref,         # [Rb, BLK] f32
    out_ref,        # [Rb, Hp, KD]
    acc_ref, m_ref, l_ref,
    *, block_size: int, block_rows: int, scale: float,
):
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    lo = j * block_size
    for r in range(block_rows):
        b = g * block_rows + r
        start = starts_ref[b]
        length = lengths_ref[b]

        @pl.when((lo < length) & (lo + block_size > start))
        def _block(r=r, start=start, length=length):
            Hp = q_ref.shape[1]
            q = q_ref[r].astype(jnp.float32)
            k = k_ref[r].astype(jnp.float32)
            v = v_ref[r].astype(jnp.float32)
            ks = ks_ref[r].astype(jnp.float32)      # [BLK]
            vs = vs_ref[r].astype(jnp.float32)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale * ks[None, :]
            pos = lo + jax.lax.broadcasted_iota(
                jnp.int32, (Hp, block_size), 1
            )
            valid = (pos >= start) & (pos < length)
            s = jnp.where(valid, s, NEG_INF)

            m_prev = m_ref[r, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            l_new = l_ref[r, :, :1] * alpha + jnp.sum(
                p, axis=1, keepdims=True
            )
            l_ref[r] = jnp.broadcast_to(l_new, l_ref.shape[1:])
            m_ref[r] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            acc_ref[r] = acc_ref[r] * alpha + jax.lax.dot_general(
                p * vs[None, :], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == n_blocks - 1)
    def _finish():
        out_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :, :1], 1e-30)
        ).astype(out_ref.dtype)


def decode_attention_packed_q8(
    q: jax.Array,          # [B, H, Hd]
    k_cache: jax.Array,    # [B, S, Kv*Hd] int8
    v_cache: jax.Array,    # [B, S, Kv*Hd] int8
    k_scale: jax.Array,    # [B, S] f32
    v_scale: jax.Array,    # [B, S] f32
    starts: jax.Array,
    lengths: jax.Array,
    *,
    num_kv: int,
    scale: Optional[float] = None,
    block_size: int = 256,
    block_rows: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """int8-cache decode attention -> [B, H, Hd] in q.dtype."""
    B, H, Hd = q.shape
    S = k_cache.shape[1]
    KD = num_kv * Hd
    G = H // num_kv
    if scale is None:
        scale = Hd**-0.5
    block_size = min(block_size, S)
    while B % block_rows:
        block_rows //= 2
    # The 2D scale operands' block shape is (block_rows, block_size): Mosaic
    # requires the sublane dim divisible by 8 (or == B). Grow rows to 8 and
    # pay for it by shrinking the block length against the same VMEM budget
    # the caller's chooser used (int8 kv blocks: 1 byte/elem).
    if block_rows < 8 and B % 8 == 0:
        block_rows = 8
        budget = 2 << 20
        while block_size > 128 and block_rows * block_size * KD > budget:
            block_size //= 2
    n_blocks = pl.cdiv(S, block_size)
    Hp = max(8, H)

    head = jnp.arange(H) // G
    lane = jnp.arange(KD)
    band = (lane[None, :] >= (head * Hd)[:, None]) & (
        lane[None, :] < ((head + 1) * Hd)[:, None]
    )
    q_tiled = jnp.tile(q, (1, 1, num_kv))[:, :, :KD]
    q_packed = jnp.where(band[None], q_tiled, 0).astype(q.dtype)
    if Hp > H:
        q_packed = jnp.pad(q_packed, ((0, 0), (0, Hp - H), (0, 0)))

    starts_g = starts.astype(jnp.int32).reshape(-1, block_rows)
    lengths_g = lengths.astype(jnp.int32).reshape(-1, block_rows)
    gfirst = jnp.min(starts_g, axis=1) // block_size
    glast = jnp.maximum(
        (jnp.max(lengths_g, axis=1) + block_size - 1) // block_size - 1, 0
    )

    def q_index(g, j, st, ln, gf, gl):
        return (g, 0, 0)

    def kv_index(g, j, st, ln, gf, gl):
        return (g, jnp.clip(j, gf[g], gl[g]), 0)

    def sc_index(g, j, st, ln, gf, gl):
        return (g, jnp.clip(j, gf[g], gl[g]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // block_rows, n_blocks),
        in_specs=[
            pl.BlockSpec((block_rows, Hp, KD), q_index),
            pl.BlockSpec((block_rows, block_size, KD), kv_index),
            pl.BlockSpec((block_rows, block_size, KD), kv_index),
            pl.BlockSpec((block_rows, block_size), sc_index),
            pl.BlockSpec((block_rows, block_size), sc_index),
        ],
        out_specs=pl.BlockSpec((block_rows, Hp, KD), q_index),
        scratch_shapes=[
            pltpu.VMEM((block_rows, Hp, KD), jnp.float32),
            pltpu.VMEM((block_rows, Hp, 128), jnp.float32),
            pltpu.VMEM((block_rows, Hp, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_q8, block_size=block_size, block_rows=block_rows,
            scale=scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, KD), q.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), lengths.astype(jnp.int32),
      gfirst, glast, q_packed, k_cache, v_cache,
      k_scale.astype(jnp.float32), v_scale.astype(jnp.float32))
    # einsum-diagonal unpack (see decode_attention_packed: XLA:TPU
    # miscompiles the slice-stack form under jit)
    out4 = out[:, :H].reshape(B, num_kv, G, num_kv, Hd)
    eye = jnp.eye(num_kv, dtype=jnp.float32)
    res = jnp.einsum("bkgjd,kj->bkgd", out4.astype(jnp.float32), eye)
    return res.reshape(B, H, Hd).astype(q.dtype)


def quantize_kv_token(k: jax.Array):
    """[..., KD] f32/bf16 -> (int8 values, f32 scale[...]) per token."""
    a = k.astype(jnp.float32)
    s = jnp.max(jnp.abs(a), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(a / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def decode_attention_packed_q8_xla(
    q, k_cache, v_cache, k_scale, v_scale, starts, lengths, *, num_kv,
    scale=None,
):
    """Oracle: dequantize then run the f32 reference."""
    k = k_cache.astype(jnp.float32) * k_scale[..., None]
    v = v_cache.astype(jnp.float32) * v_scale[..., None]
    return decode_attention_packed_xla(
        q, k.astype(q.dtype), v.astype(q.dtype), starts, lengths,
        num_kv=num_kv, scale=scale,
    )
