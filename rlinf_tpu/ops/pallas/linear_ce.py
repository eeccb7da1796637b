"""Fused linear + cross-entropy (token logprob + entropy) Pallas TPU kernel.

TPU-native replacement for the reference's two fused CE paths — the Megatron
vocab-parallel fused logprob/entropy autograd function
(reference rlinf/utils/distributed.py:1066-1264) and liger-kernel's
FusedLinearCrossEntropy on the FSDP path
(reference rlinf/hybrid_engines/fsdp/fsdp_model_manager.py:196) — designed
for the MXU/HBM balance instead of translated:

  * The lm-head matmul ``h @ W`` against a 152k vocab dominates the loss
    phase of an RL train step (~15% of the 1.5B step).  The XLA chunked-scan
    fallback (ops/logprobs.py) materializes f32 ``[B, C, V]`` logits in HBM
    several times (fwd, remat, bwd) — measured ~0.5 efficiency on v5e.
  * This kernel never materializes logits: the grid walks (row_block,
    vocab_tile); each step computes one ``[rb, vt]`` f32 logits tile on the
    MXU and folds it into ONLINE softmax statistics (running max ``m``,
    normalizer ``s1 = Σ exp(x−m)``, entropy moment ``s2 = Σ exp(x−m)·x``,
    target logit) held in VMEM scratch.  lse / logprob / entropy finalize on
    the last vocab tile.
  * Backward is a second single pass over vocab tiles: recompute the logits
    tile, form ``p = exp(x − lse)``, emit ``dz`` (bf16, written tile-by-tile)
    and accumulate ``dh = Σ dz @ Wᵀ`` in VMEM.  The weight gradient is one
    XLA matmul over the saved ``dz`` (compute-bound, no custom kernel
    needed).  Total: 4 matmul passes (fwd, recompute, dh, dw) — the same
    count as any remat-based scheme — with zero f32 logits HBM traffic.
  * Weights are accepted in EITHER ``[D, V]`` ("dv") or ``[V, D]`` ("vd")
    layout.  Qwen flagships tie embeddings, so the natural parameter is the
    ``[V, D]`` embedding table; taking it directly avoids a 467MB transpose
    copy per step.

Numerics: all softmax statistics in f32; ``dz``/``dh`` are emitted bf16
(the same precision class as every other matmul gradient in bf16 training).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0**30


def _dot_hw(h, w, w_layout):
    """h [rb, D] x W tile -> [rb, vt] f32. 'dv': w [D, vt]; 'vd': w [vt, D]."""
    if w_layout == "dv":
        dims = (((1,), (0,)), ((), ()))
    else:
        dims = (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(h, w, dims, preferred_element_type=jnp.float32)


def _dot_dzw(dz, w, w_layout):
    """dz [rb, vt] x W tile -> dh partial [rb, D] f32."""
    if w_layout == "dv":
        dims = (((1,), (1,)), ((), ()))
    else:
        dims = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(dz, w, dims, preferred_element_type=jnp.float32)


def _ce_fwd_kernel(
    h_ref,        # [rb, D]
    w_ref,        # [D, vt] or [vt, D]
    tgt_ref,      # [rb, 128] int32 (broadcast)
    lp_ref,       # [rb, 128] f32 out
    ent_ref,      # [rb, 128] f32 out
    lse_ref,      # [rb, 128] f32 out
    m_sc,         # [rb, 128] f32 scratch
    s1_sc,
    s2_sc,
    tl_sc,
    *,
    vt_size: int,
    v_real: int,
    inv_temp: float,
    w_layout: str,
):
    vt = pl.program_id(1)
    n_vt = pl.num_programs(1)

    @pl.when(vt == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        s1_sc[:] = jnp.zeros_like(s1_sc)
        s2_sc[:] = jnp.zeros_like(s2_sc)
        tl_sc[:] = jnp.zeros_like(tl_sc)

    rb = h_ref.shape[0]
    h = h_ref[:]
    w = w_ref[:]
    logits = _dot_hw(h, w, w_layout) * inv_temp          # [rb, vt] f32
    lo = vt * vt_size
    col = lo + jax.lax.broadcasted_iota(jnp.int32, (rb, vt_size), 1)
    valid = col < v_real
    logits = jnp.where(valid, logits, NEG_INF)

    m_prev = m_sc[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    ex = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
    s1 = s1_sc[:, :1] * alpha + jnp.sum(ex, axis=1, keepdims=True)
    # 0 * NEG_INF is 0 (NEG_INF is a large finite number, not IEEE inf)
    s2 = s2_sc[:, :1] * alpha + jnp.sum(
        jnp.where(valid, ex * logits, 0.0), axis=1, keepdims=True
    )
    tgt = tgt_ref[:, :1]
    tl = tl_sc[:, :1] + jnp.sum(
        jnp.where(col == tgt, logits, 0.0), axis=1, keepdims=True
    )
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
    s1_sc[:] = jnp.broadcast_to(s1, s1_sc.shape)
    s2_sc[:] = jnp.broadcast_to(s2, s2_sc.shape)
    tl_sc[:] = jnp.broadcast_to(tl, tl_sc.shape)

    @pl.when(vt == n_vt - 1)
    def _finish():
        lse = m_new + jnp.log(jnp.maximum(s1, 1e-30))
        lp_ref[:] = jnp.broadcast_to(tl - lse, lp_ref.shape)
        ent_ref[:] = jnp.broadcast_to(lse - s2 / jnp.maximum(s1, 1e-30),
                                      ent_ref.shape)
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _ce_bwd_kernel(
    h_ref,        # [rb, D]
    w_ref,
    tgt_ref,      # [rb, 128] int32
    lse_ref,      # [rb, 128] f32
    mu_ref,       # [rb, 128] f32 (= lse - entropy = E_p[x])
    glp_ref,      # [rb, 128] f32
    gent_ref,     # [rb, 128] f32
    dz_ref,       # [rb, vt] bf16 out (written every tile)
    dh_ref,       # [rb, D] bf16 out (written on last tile)
    dh_sc,        # [rb, D] f32 scratch
    *,
    vt_size: int,
    v_real: int,
    inv_temp: float,
    w_layout: str,
):
    vt = pl.program_id(1)
    n_vt = pl.num_programs(1)

    @pl.when(vt == 0)
    def _init():
        dh_sc[:] = jnp.zeros_like(dh_sc)

    rb = h_ref.shape[0]
    h = h_ref[:]
    w = w_ref[:]
    logits = _dot_hw(h, w, w_layout) * inv_temp
    lo = vt * vt_size
    col = lo + jax.lax.broadcasted_iota(jnp.int32, (rb, vt_size), 1)
    valid = col < v_real
    logits = jnp.where(valid, logits, NEG_INF)

    lse = lse_ref[:, :1]
    mu = mu_ref[:, :1]
    glp = glp_ref[:, :1]
    gent = gent_ref[:, :1]
    p = jnp.exp(logits - lse)                            # pad cols -> ~0
    onehot = (col == tgt_ref[:, :1]).astype(jnp.float32)
    # d lp / dx_j   = onehot_j - p_j
    # d ent / dx_j  = -p_j (x_j - mu)
    dx = glp * (onehot - p) - gent * (p * (logits - mu))
    dx = jnp.where(valid, dx, 0.0) * inv_temp            # dz = dx / temp
    dzb = dx.astype(jnp.bfloat16)
    dz_ref[:] = dzb
    dh_sc[:] = dh_sc[:] + _dot_dzw(dzb, w, w_layout)

    @pl.when(vt == n_vt - 1)
    def _finish():
        dh_ref[:] = dh_sc[:].astype(dh_ref.dtype)


def _pad_rows(x, mult, fill=0):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, cfg, constant_values=fill)
    return x


def _pick_blocks(n_rows: int, d: int, v: int):
    """(row_block, vocab_tile) sized against ~12MB of VMEM."""
    rb = 512
    while rb > 8 and n_rows % rb:
        rb //= 2
    vt = 1024 if d <= 2048 else 512
    return rb, vt


def _broadcast128(x, dtype):
    return jnp.broadcast_to(x.astype(dtype)[:, None], (x.shape[0], 128))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def _fused_ce(h2, w, tgt, inv_temp, w_layout, interpret):
    lp, ent, _ = _fused_ce_fwd_impl(h2, w, tgt, inv_temp, w_layout, interpret)
    return lp, ent


def _fused_ce_fwd_impl(h2, w, tgt, inv_temp, w_layout, interpret):
    n, d = h2.shape
    v_real = w.shape[1] if w_layout == "dv" else w.shape[0]
    rb, vt = _pick_blocks(n, d, v_real)
    v_pad = ((v_real + vt - 1) // vt) * vt
    if v_pad != v_real:
        if w_layout == "dv":
            w = jnp.pad(w, ((0, 0), (0, v_pad - v_real)))
        else:
            w = jnp.pad(w, ((0, v_pad - v_real), (0, 0)))
    n_rb, n_vt = n // rb, v_pad // vt

    w_block = (d, vt) if w_layout == "dv" else (vt, d)
    w_index = (
        (lambda r, c: (0, c)) if w_layout == "dv" else (lambda r, c: (c, 0))
    )
    row_index = lambda r, c: (r, 0)

    kernel = functools.partial(
        _ce_fwd_kernel, vt_size=vt, v_real=v_real, inv_temp=inv_temp,
        w_layout=w_layout,
    )
    out_shape = [jax.ShapeDtypeStruct((n, 128), jnp.float32)] * 3
    lp, ent, lse = pl.pallas_call(
        kernel,
        grid=(n_rb, n_vt),
        in_specs=[
            pl.BlockSpec((rb, d), row_index),
            pl.BlockSpec(w_block, w_index),
            pl.BlockSpec((rb, 128), row_index),
        ],
        out_specs=[pl.BlockSpec((rb, 128), row_index)] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rb, 128), jnp.float32)] * 4,
        interpret=interpret,
    )(h2, w, _broadcast128(tgt, jnp.int32))
    return lp[:, 0], ent[:, 0], lse[:, 0]


def _fused_ce_fwd(h2, w, tgt, inv_temp, w_layout, interpret):
    lp, ent, lse = _fused_ce_fwd_impl(h2, w, tgt, inv_temp, w_layout, interpret)
    return (lp, ent), (h2, w, tgt, lse, ent)


def _fused_ce_bwd(inv_temp, w_layout, interpret, res, g):
    h2, w, tgt, lse, ent = res
    g_lp, g_ent = g
    n, d = h2.shape
    v_real = w.shape[1] if w_layout == "dv" else w.shape[0]
    rb, vt = _pick_blocks(n, d, v_real)
    rb = min(rb, 256)  # dh f32 scratch doubles the VMEM appetite
    v_pad = ((v_real + vt - 1) // vt) * vt
    if v_pad != v_real:
        if w_layout == "dv":
            w_p = jnp.pad(w, ((0, 0), (0, v_pad - v_real)))
        else:
            w_p = jnp.pad(w, ((0, v_pad - v_real), (0, 0)))
    else:
        w_p = w
    n_rb, n_vt = n // rb, v_pad // vt

    w_block = (d, vt) if w_layout == "dv" else (vt, d)
    w_index = (
        (lambda r, c: (0, c)) if w_layout == "dv" else (lambda r, c: (c, 0))
    )
    row_index = lambda r, c: (r, 0)
    mu = lse - ent

    kernel = functools.partial(
        _ce_bwd_kernel, vt_size=vt, v_real=v_real, inv_temp=inv_temp,
        w_layout=w_layout,
    )
    dz, dh = pl.pallas_call(
        kernel,
        grid=(n_rb, n_vt),
        in_specs=[
            pl.BlockSpec((rb, d), row_index),
            pl.BlockSpec(w_block, w_index),
            pl.BlockSpec((rb, 128), row_index),
            pl.BlockSpec((rb, 128), row_index),
            pl.BlockSpec((rb, 128), row_index),
            pl.BlockSpec((rb, 128), row_index),
            pl.BlockSpec((rb, 128), row_index),
        ],
        out_specs=[
            pl.BlockSpec((rb, vt), lambda r, c: (r, c)),
            pl.BlockSpec((rb, d), row_index),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, v_pad), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, d), h2.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((rb, d), jnp.float32)],
        interpret=interpret,
    )(
        h2, w_p, _broadcast128(tgt, jnp.int32),
        _broadcast128(lse, jnp.float32), _broadcast128(mu, jnp.float32),
        _broadcast128(g_lp, jnp.float32), _broadcast128(g_ent, jnp.float32),
    )
    # Weight gradient: one clean XLA matmul over the saved dz (compute-bound).
    if w_layout == "dv":
        dw = jnp.einsum(
            "nd,nv->dv", h2, dz[:, :v_real],
            preferred_element_type=jnp.float32,
        ).astype(w.dtype)
    else:
        dw = jnp.einsum(
            "nv,nd->vd", dz[:, :v_real], h2,
            preferred_element_type=jnp.float32,
        ).astype(w.dtype)
    return dh, dw, None


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_linear_ce(
    hidden: jax.Array,      # [B, S, D] (or [N, D])
    w: jax.Array,           # [D, V] ("dv") or [V, D] ("vd", tied embedding)
    target_ids: jax.Array,  # [B, S] (or [N]) int
    *,
    temperature: float = 1.0,
    w_layout: str = "dv",
    row_chunk: int = 4096,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(logprob of target, entropy) per position, f32, differentiable.

    Pallas fused kernel — see module docstring. Row count is padded to the
    row-block size internally; outputs keep the input's leading shape.

    row_chunk bounds the backward pass's ``dz`` HBM transient (bf16
    [rows, V] ≈ 0.3 GB/1k rows at a 152k vocab): above it, rows run through
    a ``lax.scan`` of kernel calls — CE is row-independent, and autodiff
    through the scan sums the per-chunk ``dw`` cotangents.
    """
    assert w_layout in ("dv", "vd")
    lead = hidden.shape[:-1]
    d = hidden.shape[-1]
    h2 = hidden.reshape(-1, d)
    tgt = target_ids.reshape(-1).astype(jnp.int32)
    n = h2.shape[0]
    inv_temp = 1.0 / temperature

    if n > row_chunk and n % row_chunk == 0:
        n_ch = n // row_chunk
        h_c = h2.reshape(n_ch, row_chunk, d)
        t_c = tgt.reshape(n_ch, row_chunk)

        def body(_, xs):
            hc, tc = xs
            return None, _fused_ce(hc, w, tc, inv_temp, w_layout, interpret)

        _, (lp, ent) = jax.lax.scan(body, None, (h_c, t_c))
        return lp.reshape(lead), ent.reshape(lead)

    rb, _ = _pick_blocks(max(n, 8), d, w.shape[1] if w_layout == "dv" else w.shape[0])
    n_pad = ((n + rb - 1) // rb) * rb
    if n_pad != n:
        h2 = _pad_rows(h2, rb)
        tgt = _pad_rows(tgt, rb)
    lp, ent = _fused_ce(h2, w, tgt, inv_temp, w_layout, interpret)
    lp = lp[:n].reshape(lead)
    ent = ent[:n].reshape(lead)
    return lp, ent
