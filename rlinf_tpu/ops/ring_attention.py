"""Ring attention: context-parallel causal attention over a mesh axis.

TPU-native replacement for Megatron/TransformerEngine's context-parallel ring
attention (reference §2.8: ``context_parallel_size`` at
rlinf/utils/initialize.py:237-243; the CP kernel itself lives in TE, not
in-repo). Sequence is sharded over the ``context`` mesh axis; K/V blocks
rotate around the ring via ``jax.lax.ppermute`` (XLA lowers to ICI
collective-permute), with flash-style online-softmax merging of per-block
partial results — O(S/cp) memory per chip and compute that overlaps the
permute latency.

Implemented with ``jax.shard_map``; the inner per-block attention reuses the
same masking model as ops/attention.py (absolute positions + validity), which
makes causality exact for any sequence sharding layout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -2.0**30


def _block_attention(q, k, v, pos_q, pos_kv, kv_valid, scale):
    """Partial attention of local q against one k/v block.

    q: [B, Sq, H, D]; k/v: [B, Sk, K, D]. Returns (numerator [B,Sq,H,D],
    running max m [B,Sq,H], running denom l [B,Sq,H]) for online merging.
    """
    B, Sq, H, D = q.shape
    K = k.shape[2]
    G = H // K
    qg = q.reshape(B, Sq, K, G, D).astype(jnp.float32)
    s = jnp.einsum("bqkgd,bskd->bkgqs", qg, k.astype(jnp.float32)) * scale
    mask = (pos_kv[:, None, :] <= pos_q[:, :, None]) & kv_valid[:, None, :]
    s = jnp.where(mask[:, None, None, :, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)                          # [B,K,G,Sq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    num = jnp.einsum("bkgqs,bskd->bkgqd", p, v.astype(jnp.float32))
    # reshape to [B, Sq, H, ...]
    num = num.reshape(B, K * G, Sq, D).transpose(0, 2, 1, 3)
    m = m.reshape(B, K * G, Sq).transpose(0, 2, 1)
    l = l.reshape(B, K * G, Sq).transpose(0, 2, 1)
    return num, m, l


def _merge(acc, new):
    """Online-softmax merge of two partial results."""
    num1, m1, l1 = acc
    num2, m2, l2 = new
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    return (
        num1 * a1[..., None] + num2 * a2[..., None],
        m,
        l1 * a1 + l2 * a2,
    )


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "context",
    positions: Optional[jax.Array] = None,
    kv_valid_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Causal GQA attention with the sequence dim sharded over ``axis``.

    q: [B, S, H, D]; k/v: [B, S, K, D]; positions/kv_valid_mask: [B, S] —
    all sharded P(None, axis, ...) on the sequence dim. Output has the same
    sharding as q.
    """
    B, S, H, D = q.shape
    if scale is None:
        scale = D**-0.5
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    if kv_valid_mask is None:
        kv_valid_mask = jnp.ones((B, S), bool)
    cp = mesh.shape[axis]

    def local_fn(q, k, v, pos, valid):
        # local shapes: q [B, S/cp, H, D]; k/v [B, S/cp, K, D]
        my = jax.lax.axis_index(axis)
        acc = _block_attention(q, k, v, pos, pos, valid, scale)

        def body(step, carry):
            acc, k_blk, v_blk, pos_blk, valid_blk = carry
            # rotate kv one hop around the ring (device i -> i+1)
            perm = [(i, (i + 1) % cp) for i in range(cp)]
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            pos_blk = jax.lax.ppermute(pos_blk, axis, perm)
            valid_blk = jax.lax.ppermute(valid_blk, axis, perm)
            new = _block_attention(q, k_blk, v_blk, pos, pos_blk, valid_blk, scale)
            return (_merge(acc, new), k_blk, v_blk, pos_blk, valid_blk)

        acc, _, _, _, _ = jax.lax.fori_loop(
            0, cp - 1, body, (acc, k, v, pos, valid)
        )
        num, m, l = acc
        out = num / jnp.maximum(l, 1e-30)[..., None]
        return out.astype(q.dtype)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None),
            P(None, axis, None, None),
            P(None, axis, None, None),
            P(None, axis),
            P(None, axis),
        ),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return fn(q, k, v, positions, kv_valid_mask)
