"""Flash attention (forward + backward) as Pallas TPU kernels.

Replaces flash-attn / TransformerEngine fused attention from the reference's
dependency stack (SURVEY.md §2.9) with a TPU-native kernel: online-softmax
tiles streamed through VMEM, O(S) memory, fp32 accumulation, GQA-aware.

Masking model (matches ops/attention.py): causality is ``pos_kv <= pos_q``
over caller-provided absolute positions plus a kv validity mask — one code
path covers right/left padding and chunked prefill.

Layout: operands are transposed to head-major [B, H, S, D] so Mosaic's tiling
constraint (last two block dims multiple of (8, 128) or full) falls on
(S_block, D). Grid = (B, H, num_q_blocks); the kv head for q-head h is
selected by the BlockSpec index map (h // group_size) — no GQA replication.
The kv loop runs inside the kernel (fori_loop) so the running max/sum stay in
VMEM. Backward uses the standard flash two-kernel split: a dQ pass (loop over
kv blocks) and a dK/dV pass (loop over q blocks), both re-reading the saved
logsumexp.

Causal block skipping (the flash-attn "block-sparse causal" trick): per-block
position ranges are computed OUTSIDE the kernel and passed as scalar
prefetch; each program's inner loop runs only to its last needed kv block
(fwd/dq) or from its first needed q block (dk/dv) — dynamic fori bounds from
SMEM. For arange positions (training) this halves attention compute; for
arbitrary position layouts it is conservative and exact (blocks inside the
bound that are fully masked still mask to -inf).

On non-TPU backends the kernels run in interpret mode (the CPU test mesh);
numerics match the XLA reference to fp32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0**30
_IMAX = jnp.iinfo(jnp.int32).max

# 512-token tiles: measured r3 on v5e at T=2048 fwd+bwd — 128/128 24.9ms,
# 256/256 15.9ms, 512/512 11.8ms vs XLA attention 17.2ms. Small tiles
# under-fill the MXU at head dim 64; 512 amortizes per-dot overheads.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    hi_ref,                                   # [B, num_qb] scalar prefetch
    q_ref, k_ref, v_ref, pq_ref, pkv_ref, val_ref,
    o_ref, lse_ref,
    *, scale: float, block_k: int, seq_k: int,
):
    # q_ref [1,1,BQ,D]; k/v_ref [1,1,Sk,D]; pq [1,1,BQ]; pkv/val [1,1,Sk]
    b = pl.program_id(0)
    i = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale          # [BQ, D]
    bq, d = q.shape
    pos_q = pq_ref[0, 0, :].astype(jnp.int32)            # [BQ]
    hi = hi_ref[b, i]                                    # needed kv blocks

    def body(jk, carry):
        acc, m, l = carry
        k_blk = k_ref[0, 0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        pos_kv = pkv_ref[0, 0, pl.ds(jk * block_k, block_k)].astype(jnp.int32)
        valid = val_ref[0, 0, pl.ds(jk * block_k, block_k)]
        mask = (pos_kv[None, :] <= pos_q[:, None]) & (valid[None, :] != 0)
        s = jnp.where(mask, s, NEG_INF)

        m_blk = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, hi, body, (acc0, m0, l0))

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l_safe))[:, None]


def _in_specs(G, Sk, D, block_q):
    """(q, k, v, pq, pkv, val) specs for head-major operands on a
    (B, H, num_q_blocks) grid with one scalar-prefetch operand."""
    return [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, s: (b, h, i, 0)),
        pl.BlockSpec((1, 1, Sk, D), lambda b, h, i, s: (b, h // G, 0, 0)),
        pl.BlockSpec((1, 1, Sk, D), lambda b, h, i, s: (b, h // G, 0, 0)),
        pl.BlockSpec((1, 1, block_q), lambda b, h, i, s: (b, 0, i)),
        pl.BlockSpec((1, 1, Sk), lambda b, h, i, s: (b, 0, 0)),
        pl.BlockSpec((1, 1, Sk), lambda b, h, i, s: (b, 0, 0)),
    ]


def _block_bounds(pos_q, pos_kv, valid, block_q, block_k):
    """Per-(row, block) causal bounds, computed once in XLA.

    hi[b, i] = 1 + last kv block whose min VALID position is <= the q
    block's max position (0 if none) — the fwd/dq trip count.
    lo[b, j] = first q block whose max position reaches the kv block's min
    valid position (num_qb if none) — the dk/dv loop start.
    """
    B, Sq = pos_q.shape
    Sk = pos_kv.shape[1]
    num_qb, num_kb = Sq // block_q, Sk // block_k
    qmax = pos_q.reshape(B, num_qb, block_q).max(-1)                # [B, nq]
    kmin = jnp.where(valid != 0, pos_kv, _IMAX).reshape(
        B, num_kb, block_k
    ).min(-1)                                                       # [B, nk]
    needed = kmin[:, None, :] <= qmax[:, :, None]                   # [B,nq,nk]
    hi = jnp.where(
        needed, jnp.arange(num_kb)[None, None, :] + 1, 0
    ).max(-1).astype(jnp.int32)                                     # [B, nq]
    lo = jnp.where(
        needed, jnp.arange(num_qb)[None, :, None], num_qb
    ).min(1).astype(jnp.int32)                                      # [B, nk]
    return hi, lo


def _fwd_call(q, k, v, pos_q, pos_kv, valid, scale, block_q, block_k):
    # q [B,H,Sq,D]; k/v [B,K,Sk,D]; pos_q [B,1,Sq]; pos_kv/valid [B,1,Sk]
    B, H, Sq, D = q.shape
    K, Sk = k.shape[1], k.shape[2]
    G = H // K
    hi, _ = _block_bounds(
        pos_q[:, 0], pos_kv[:, 0], valid[:, 0], block_q, block_k
    )
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, seq_k=Sk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, Sq // block_q),
        in_specs=_in_specs(G, Sk, D, block_q),
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, s: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, s: (b, h, i, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Sq, 1), jnp.float32),
        ],
        interpret=_interpret(),
        # long-context headroom: at Sk=8192 the bwd dk/dv call's two f32
        # [Sk, D] output slabs alone fill the default 16MB scoped-vmem
        # budget once double-buffered
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(hi, q, k, v, pos_q, pos_kv, valid)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    hi_ref,
    q_ref, k_ref, v_ref, pq_ref, pkv_ref, val_ref, do_ref, lse_ref, delta_ref,
    dq_ref, *, scale, block_k, seq_k,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, :, 0]
    delta = delta_ref[0, 0, :, 0]
    pos_q = pq_ref[0, 0, :].astype(jnp.int32)
    bq, d = q.shape
    hi = hi_ref[b, i]

    def body(jk, dq):
        k_blk = k_ref[0, 0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(jk * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        pos_kv = pkv_ref[0, 0, pl.ds(jk * block_k, block_k)].astype(jnp.int32)
        valid = val_ref[0, 0, pl.ds(jk * block_k, block_k)]
        mask = (pos_kv[None, :] <= pos_q[:, None]) & (valid[None, :] != 0)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta[:, None]) * scale
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    lo_ref,
    q_ref, k_ref, v_ref, pq_ref, pkv_ref, val_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, *, scale, block_q, seq_q,
):
    # Grid (B, H, num_k_blocks): each program accumulates q-head h's
    # contribution to kv block j; the wrapper sums over each GQA group.
    b = pl.program_id(0)
    j = pl.program_id(2)
    k_blk = k_ref[0, 0].astype(jnp.float32)   # [BK, D]
    v_blk = v_ref[0, 0].astype(jnp.float32)
    pos_kv = pkv_ref[0, 0, :].astype(jnp.int32)
    valid = val_ref[0, 0, :]
    bk, d = k_blk.shape
    num_qb = seq_q // block_q
    lo = lo_ref[b, j]

    def body(iq, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(iq * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(iq * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(iq * block_q, block_q), 0]
        delta = delta_ref[0, 0, pl.ds(iq * block_q, block_q), 0]
        pos_q = pq_ref[0, 0, pl.ds(iq * block_q, block_q)].astype(jnp.int32)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BK]
        mask = (pos_kv[None, :] <= pos_q[:, None]) & (valid[None, :] != 0)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta[:, None]) * scale
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, num_qb, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (head-major layout)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash(q, k, v, pos_q, pos_kv, valid, scale, block_q, block_k):
    o, _ = _fwd_call(q, k, v, pos_q, pos_kv, valid, scale, block_q, block_k)
    return o


def _flash_fwd(q, k, v, pos_q, pos_kv, valid, scale, block_q, block_k):
    o, lse = _fwd_call(q, k, v, pos_q, pos_kv, valid, scale, block_q, block_k)
    return o, (q, k, v, pos_q, pos_kv, valid, o, lse)


def _flash_bwd(scale, block_q, block_k, res, do):
    q, k, v, pos_q, pos_kv, valid, o, lse = res
    B, H, Sq, D = q.shape
    K, Sk = k.shape[1], k.shape[2]
    G = H // K
    hi, lo = _block_bounds(
        pos_q[:, 0], pos_kv[:, 0], valid[:, 0], block_q, block_k
    )
    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B, H, Sq, 1]

    bwd_in_specs = _in_specs(G, Sk, D, block_q) + [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, s: (b, h, i, 0)),  # do
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, s: (b, h, i, 0)),  # lse
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, s: (b, h, i, 0)),  # delta
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k, seq_k=Sk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, Sq // block_q),
            in_specs=bwd_in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i, s: (b, h, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        interpret=_interpret(),
        # long-context headroom: at Sk=8192 the bwd dk/dv call's two f32
        # [Sk, D] output slabs alone fill the default 16MB scoped-vmem
        # budget once double-buffered
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(hi, q, k, v, pos_q, pos_kv, valid, do, lse, delta)

    dkv_specs = [
        pl.BlockSpec((1, 1, Sq, D), lambda b, h, j, s: (b, h, 0, 0)),        # q
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, s: (b, h // G, j, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, s: (b, h // G, j, 0)),
        pl.BlockSpec((1, 1, Sq), lambda b, h, j, s: (b, 0, 0)),
        pl.BlockSpec((1, 1, block_k), lambda b, h, j, s: (b, 0, j)),
        pl.BlockSpec((1, 1, block_k), lambda b, h, j, s: (b, 0, j)),
        pl.BlockSpec((1, 1, Sq, D), lambda b, h, j, s: (b, h, 0, 0)),        # do
        pl.BlockSpec((1, 1, Sq, 1), lambda b, h, j, s: (b, h, 0, 0)),        # lse
        pl.BlockSpec((1, 1, Sq, 1), lambda b, h, j, s: (b, h, 0, 0)),        # delta
    ]
    # dk/dv emitted per q-head [B, H, Sk, D], then reduced over each group.
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q, seq_q=Sq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, Sk // block_k),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, s: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, j, s: (b, h, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Sk, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Sk, D), jnp.float32),
        ],
        interpret=_interpret(),
        # long-context headroom: at Sk=8192 the bwd dk/dv call's two f32
        # [Sk, D] output slabs alone fill the default 16MB scoped-vmem
        # budget once double-buffered
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(lo, q, k, v, pos_q, pos_kv, valid, do, lse, delta)

    dk = dk_h.reshape(B, K, G, Sk, D).sum(axis=2).astype(k.dtype)
    dv = dv_h.reshape(B, K, G, Sk, D).sum(axis=2).astype(v.dtype)
    return dq, dk, dv, None, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public API (matches ops.attention.causal_attention)
# ---------------------------------------------------------------------------

def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    positions_q: Optional[jax.Array] = None,
    positions_kv: Optional[jax.Array] = None,
    kv_valid_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """GQA causal flash attention. q: [B, Sq, H, D]; k/v: [B, Sk, K, D]."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D**-0.5
    if positions_q is None:
        positions_q = jnp.broadcast_to(jnp.arange(Sq)[None, :], (B, Sq))
    if positions_kv is None:
        positions_kv = jnp.broadcast_to(jnp.arange(Sk)[None, :], (B, Sk))
    if kv_valid_mask is None:
        kv_valid_mask = jnp.ones((B, Sk), bool)

    block_q = min(block_q, Sq)
    block_k = min(block_k, Sk)
    pad_q = (-Sq) % block_q
    pad_k = (-Sk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        positions_q = jnp.pad(positions_q, ((0, 0), (0, pad_q)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        positions_kv = jnp.pad(positions_kv, ((0, 0), (0, pad_k)))
        kv_valid_mask = jnp.pad(kv_valid_mask, ((0, 0), (0, pad_k)))

    # head-major for Mosaic tiling: [B, H|K, S, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = _flash(
        qt, kt, vt,
        positions_q.astype(jnp.int32)[:, None, :],
        positions_kv.astype(jnp.int32)[:, None, :],
        kv_valid_mask.astype(jnp.int32)[:, None, :],
        float(scale), block_q, block_k,
    )
    o = o.transpose(0, 2, 1, 3)
    if pad_q:
        o = o[:, :Sq]
    return o
