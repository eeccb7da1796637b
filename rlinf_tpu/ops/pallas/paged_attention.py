"""Paged decode attention (Pallas TPU kernel + XLA reference).

The TPU-native replacement for the reference's SGLang/FlashInfer paged-KV
decode kernels (SURVEY.md §2.9: "paged-KV autoregressive serving"): the KV
cache lives in a global PAGE POOL in HBM; each decode slot owns a list of
pages recorded in a page table. Continuous batching then never copies or
re-pads KV state — slot turnover just rewrites page-table rows.

Kernel design (one program per (slot, kv_head, page) grid step):
  * ``PrefetchScalarGridSpec`` with the page table and sequence lengths as
    scalar-prefetch operands — the BlockSpec index map reads
    ``page_table[b, j]`` to pick WHICH page the pipeline DMAs next, so the
    Mosaic pipeline machinery provides HBM->VMEM double buffering of pages
    automatically (the guide's double-buffer pattern without hand-rolled
    semaphores).
  * Online-softmax accumulation in VMEM scratch across the page grid
    dimension (the innermost, sequentially executed on TPU): running max
    ``m``, normalizer ``l``, and accumulator ``acc`` persist across pages;
    the output block is written once on the final page.
  * GQA: q is viewed as [B, Kv, G, Hd]; each program attends G query heads
    against one kv head's page — scores are [G, page] matmuls on the MXU,
    fp32 accumulation.
  * Pages past a slot's length are skipped with ``pl.when`` (their DMA
    degenerates to refetching page-table entry 0 — callers pad the table
    with zeros — but no compute or output traffic happens).

Decode is HBM-bandwidth-bound; the win over dense-cache decode attention is
that only ~length/page_size pages stream per slot instead of the padded
S_max cache, and slot turnover is O(1).
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
    page_table_ref,   # [B, max_pages] int32
    lengths_ref,      # [B] int32
    # blocks
    q_ref,            # [1, 1, G, Hd]
    k_ref,            # [1, 1, P, Hd]  (page p, kv head h)
    v_ref,            # [1, 1, P, Hd]
    out_ref,          # [1, 1, G, Hd]
    # scratch
    acc_ref,          # [G, Hd] f32
    m_ref,            # [G, 128] f32 (col 0 used; lane-aligned)
    l_ref,            # [G, 128] f32
    *,
    page_size: int,
    scale: float,
):
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_pages = pl.num_programs(2)
    length = lengths_ref[b]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j * page_size < length)
    def _page():
        q = q_ref[0, 0].astype(jnp.float32)   # [G, Hd]
        k = k_ref[0, 0].astype(jnp.float32)   # [P, Hd]
        v = v_ref[0, 0].astype(jnp.float32)
        G, Hd = q.shape
        P = k.shape[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                              # [G, P]
        pos = j * page_size + jax.lax.broadcasted_iota(jnp.int32, (G, P), 1)
        s = jnp.where(pos < length, s, NEG_INF)

        m_prev = m_ref[:, :1]                              # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                    # [G, 1]
        p = jnp.exp(s - m_new)                             # [G, P]
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_pages - 1)
    def _finish():
        out_ref[0, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(out_ref.dtype)


def paged_attention(
    q: jax.Array,            # [B, H, Hd] one decode token per slot
    k_pages: jax.Array,      # [num_pages, Kv, P, Hd] global page pool
    v_pages: jax.Array,      # [num_pages, Kv, P, Hd]
    page_table: jax.Array,   # [B, max_pages] int32 (pad unused with 0)
    lengths: jax.Array,      # [B] int32 valid tokens per slot (incl. current)
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, H, Hd] attention output in q.dtype."""
    B, H, Hd = q.shape
    num_pages, Kv, P, _ = k_pages.shape
    G = H // Kv
    max_pages = page_table.shape[1]
    if scale is None:
        scale = Hd**-0.5

    q4 = q.reshape(B, Kv, G, Hd)
    grid = (B, Kv, max_pages)

    def q_index(b, h, j, pt, ln):
        return (b, h, 0, 0)

    def kv_index(b, h, j, pt, ln):
        return (pt[b, j], h, 0, 0)

    def out_index(b, h, j, pt, ln):
        return (b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G, Hd), q_index),
            pl.BlockSpec((1, 1, P, Hd), kv_index),
            pl.BlockSpec((1, 1, P, Hd), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, G, Hd), out_index),
        scratch_shapes=[
            pltpu.VMEM((G, Hd), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, page_size=P, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kv, G, Hd), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32),
      q4, k_pages, v_pages)
    return out.reshape(B, H, Hd)


def paged_attention_xla(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """XLA reference with identical semantics: gather the slot's pages into a
    dense [B, max_pages*P, Kv, Hd] view and run masked decode attention.
    Used on CPU/debug and as the numerics oracle for the kernel."""
    from rlinf_tpu.ops.attention import decode_attention

    B, H, Hd = q.shape
    num_pages, Kv, P, _ = k_pages.shape
    max_pages = page_table.shape[1]
    # gather: [B, max_pages, Kv, P, Hd] -> [B, max_pages*P, Kv, Hd]
    k = k_pages[page_table]  # [B, max_pages, Kv, P, Hd]
    v = v_pages[page_table]
    k = k.transpose(0, 1, 3, 2, 4).reshape(B, max_pages * P, Kv, Hd)
    v = v.transpose(0, 1, 3, 2, 4).reshape(B, max_pages * P, Kv, Hd)
    valid = jnp.arange(max_pages * P)[None, :] < lengths[:, None]
    out = decode_attention(q[:, None], k, v, valid, scale=scale)
    return out[:, 0]
