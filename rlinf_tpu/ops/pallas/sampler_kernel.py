"""Fused lm-head + sampling Pallas TPU kernel.

Decode's epilogue in the XLA path is three HBM round-trips over the fp32
``[B, V]`` logits (write from the lm-head matmul, read for gumbel+argmax,
read for logsumexp) plus a separately generated ``[B, V]`` gumbel tensor —
measured ~0.4 ms of a ~4 ms decode step at B=64, V=152k (reference serving
engines fuse this in CUDA samplers; SURVEY.md §2.9).

This kernel walks vocab tiles once: each grid step computes one
``[B, vt]`` logits tile on the MXU straight from the int8 lm-head chunk
(per-channel scale folded into the epilogue), draws its gumbel noise from
the on-core PRNG, and maintains ONLINE (a) logsumexp statistics of the
temperature-scaled logits and (b) the running best (score, index, scaled
logit) triple.  Nothing [B, V]-shaped ever exists.

Semantics:
  * token ~ Categorical(softmax(logits / T)) via gumbel-max; logprob is the
    temperature-scaled behavior logprob — identical DISTRIBUTION to
    sampler.sample_from_logits, different RNG stream (the parity gate
    checks greedy-token agreement and logprob-given-token correctness).
  * greedy=True: argmax of raw logits, logprob under the unscaled softmax
    (matches sample_from_logits' greedy branch).
  * top_k / top_p are not supported here — callers fall back to the XLA
    sampler (generate() dispatches).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0**30


def _sample_kernel(
    seed_ref,     # [1] int32 (scalar prefetch)
    x_ref,        # [B, D]
    w_ref,        # [D, vt] int8
    ws_ref,       # [1, vt] f32 per-channel scale
    tok_ref,      # [B, 128] int32 out
    lp_ref,       # [B, 128] f32 out
    mx_sc,        # [B, 128] f32: running max of scaled logits (for lse)
    s1_sc,        # [B, 128] f32: running sumexp
    bs_sc,        # [B, 128] f32: best score (scaled + gumbel)
    bi_sc,        # [B, 128] i32: best index
    bz_sc,        # [B, 128] f32: best token's scaled logit
    *,
    vt_size: int,
    v_real: int,
    inv_temp: float,
    greedy: bool,
):
    vt = pl.program_id(0)
    n_vt = pl.num_programs(0)

    @pl.when(vt == 0)
    def _init():
        mx_sc[:] = jnp.full_like(mx_sc, NEG_INF)
        s1_sc[:] = jnp.zeros_like(s1_sc)
        bs_sc[:] = jnp.full_like(bs_sc, NEG_INF)
        bi_sc[:] = jnp.zeros_like(bi_sc)
        bz_sc[:] = jnp.full_like(bz_sc, NEG_INF)

    B = x_ref.shape[0]
    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)
    z = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * ws_ref[0][None, :] * inv_temp                     # [B, vt] f32
    lo = vt * vt_size
    col = lo + jax.lax.broadcasted_iota(jnp.int32, (B, vt_size), 1)
    valid = col < v_real
    z = jnp.where(valid, z, NEG_INF)

    # online lse of the scaled logits
    m_prev = mx_sc[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(z, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    ex = jnp.where(valid, jnp.exp(z - m_new), 0.0)
    s1 = s1_sc[:, :1] * alpha + jnp.sum(ex, axis=1, keepdims=True)
    mx_sc[:] = jnp.broadcast_to(m_new, mx_sc.shape)
    s1_sc[:] = jnp.broadcast_to(s1, s1_sc.shape)

    if greedy:
        score = z
    else:
        pltpu.prng_seed(seed_ref[0] + vt)
        bits = pltpu.bitcast(pltpu.prng_random_bits((B, vt_size)), jnp.uint32)
        # uniform in [1, 2) via mantissa stuffing (avoids uint32->f32
        # convert, which Mosaic lowers poorly), then shift to (0, 1)
        mant = jax.lax.bitwise_or(
            jax.lax.shift_right_logical(bits, jnp.uint32(9)),
            jnp.uint32(0x3F800000),
        )
        u = pltpu.bitcast(mant, jnp.float32) - 1.0
        u = jnp.maximum(u, 1e-10)
        g = -jnp.log(-jnp.log(u))
        score = jnp.where(valid, z + g, NEG_INF)

    t_max = jnp.max(score, axis=1, keepdims=True)         # [B, 1]
    is_max = score == t_max
    t_idx = jnp.max(jnp.where(is_max, col, -1), axis=1, keepdims=True)
    t_z = jnp.max(jnp.where(is_max, z, NEG_INF), axis=1, keepdims=True)

    better = t_max > bs_sc[:, :1]
    bs_sc[:] = jnp.broadcast_to(
        jnp.where(better, t_max, bs_sc[:, :1]), bs_sc.shape)
    bi_sc[:] = jnp.broadcast_to(
        jnp.where(better, t_idx, bi_sc[:, :1]), bi_sc.shape)
    bz_sc[:] = jnp.broadcast_to(
        jnp.where(better, t_z, bz_sc[:, :1]), bz_sc.shape)

    @pl.when(vt == n_vt - 1)
    def _finish():
        lse = mx_sc[:, :1] + jnp.log(jnp.maximum(s1_sc[:, :1], 1e-30))
        tok_ref[:] = jnp.broadcast_to(bi_sc[:, :1], tok_ref.shape)
        lp_ref[:] = jnp.broadcast_to(bz_sc[:, :1] - lse, lp_ref.shape)


def fused_lmhead_sample(
    hidden: jax.Array,        # [B, D] (bf16)
    lm_q: jax.Array,          # [D, V] int8
    lm_scale: jax.Array,      # [1, V] or [V] f32 per-out-channel scale
    seed: jax.Array,          # scalar int32
    *,
    temperature: float = 1.0,
    greedy: bool = False,
    vt_size: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """-> (token [B] int32, behavior logprob [B] f32). See module docstring."""
    B, D = hidden.shape
    V = lm_q.shape[1]
    lm_scale = lm_scale.reshape(1, -1)
    v_pad = ((V + vt_size - 1) // vt_size) * vt_size
    if v_pad != V:
        lm_q = jnp.pad(lm_q, ((0, 0), (0, v_pad - V)))
        lm_scale = jnp.pad(lm_scale, ((0, 0), (0, v_pad - V)))
    n_vt = v_pad // vt_size
    inv_temp = 1.0 if greedy or temperature == 0.0 else 1.0 / temperature

    kernel = functools.partial(
        _sample_kernel, vt_size=vt_size, v_real=V, inv_temp=inv_temp,
        greedy=greedy or temperature == 0.0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_vt,),
        in_specs=[
            pl.BlockSpec((B, D), lambda v, s: (0, 0)),
            pl.BlockSpec((D, vt_size), lambda v, s: (0, v)),
            pl.BlockSpec((1, vt_size), lambda v, s: (0, v)),
        ],
        out_specs=[
            pl.BlockSpec((B, 128), lambda v, s: (0, 0)),
            pl.BlockSpec((B, 128), lambda v, s: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((B, 128), jnp.float32)] * 3
        + [pltpu.VMEM((B, 128), jnp.int32)]
        + [pltpu.VMEM((B, 128), jnp.float32)],
    )
    tok, lp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), hidden, lm_q, lm_scale)
    return tok[:, 0], lp[:, 0]
