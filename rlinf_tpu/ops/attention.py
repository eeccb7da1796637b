"""Attention: causal (training/prefill) and KV-cache decode.

XLA implementations here; the Pallas flash-attention kernel lives in
``rlinf_tpu.ops.pallas.flash_attention`` and is selected on TPU via
``causal_attention(..., impl="pallas")``.

Replaces the reference's TransformerEngine/flash-attn/SGLang attention kernels
(SURVEY.md §2.9). Softmax is computed in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.0**30  # large finite negative; avoids NaN from (-inf) - (-inf)


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """Scores for grouped-query attention.

    q: [B, Sq, H, D], k: [B, Sk, K, D] with H = K * G.
    Returns [B, K, G, Sq, Sk].
    """
    B, Sq, H, D = q.shape
    K = k.shape[2]
    G = H // K
    qg = q.reshape(B, Sq, K, G, D)
    return jnp.einsum("bqkgd,bskd->bkgqs", qg, k)


def causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    positions_q: Optional[jax.Array] = None,
    positions_kv: Optional[jax.Array] = None,
    kv_valid_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jax.Array:
    """Causal (optionally padded) grouped-query attention.

    Args:
      q: [B, Sq, H, D] ; k, v: [B, Sk, K, D] (GQA: H divisible by K).
      positions_q / positions_kv: [B, Sq] / [B, Sk] absolute positions.
        Causality is enforced as pos_kv <= pos_q, which handles left-padded
        prompts and chunked prefill uniformly. Default: arange per batch.
      kv_valid_mask: [B, Sk] bool — False marks padding keys.
      scale: defaults to D ** -0.5.
    Returns: [B, Sq, H, D] in q.dtype.
    """
    if impl == "flash":      # alias for the in-tree flash kernel
        impl = "pallas"
    if impl == "pallas":
        from rlinf_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(
            q, k, v,
            positions_q=positions_q,
            positions_kv=positions_kv,
            kv_valid_mask=kv_valid_mask,
            scale=scale,
        )
    if impl == "ring":
        # Context parallelism: sequence sharded over the mesh CONTEXT axis,
        # K/V blocks rotating via ppermute (reference Megatron CP,
        # utils/initialize.py:237-243). Requires an ambient mesh
        # (jax.set_mesh) whose context axis exists; size-1 context falls
        # back to the XLA path below.
        from rlinf_tpu.ops.ring_attention import ring_attention
        from rlinf_tpu.parallel.mesh import AxisNames as Ax

        mesh = jax.sharding.get_abstract_mesh()
        if (
            mesh is not None and not mesh.empty
            and Ax.CONTEXT in mesh.shape and mesh.shape[Ax.CONTEXT] > 1
        ):
            return ring_attention(
                q, k, v, mesh=mesh, axis=Ax.CONTEXT,
                positions=positions_q, kv_valid_mask=kv_valid_mask,
                scale=scale,
            )
        impl = "xla"
    if impl != "xla":
        # an unknown impl silently falling through to the dense O(S^2)
        # materialization is a 24GB footgun at long context — fail loudly
        raise ValueError(
            f"unknown attention impl {impl!r}; use xla | pallas | flash | "
            "ring")

    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = D**-0.5
    if positions_q is None:
        positions_q = jnp.broadcast_to(jnp.arange(Sq)[None, :], (B, Sq))
    if positions_kv is None:
        positions_kv = jnp.broadcast_to(jnp.arange(Sk)[None, :], (B, Sk))

    scores = _gqa_scores(q, k).astype(jnp.float32) * scale  # [B,K,G,Sq,Sk]

    mask = positions_kv[:, None, :] <= positions_q[:, :, None]  # [B, Sq, Sk]
    if kv_valid_mask is not None:
        mask = mask & kv_valid_mask[:, None, :]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v)
    return out.reshape(B, Sq, H, D)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    valid_mask: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Single-token attention against a preallocated KV cache.

    q: [B, 1, H, D]; k_cache/v_cache: [B, S_max, K, D];
    valid_mask: [B, S_max] bool — True where a cache slot holds a real token
    (handles left-padded prompts, whose invalid slots are a prefix).
    """
    B, _, H, D = q.shape
    if scale is None:
        scale = D**-0.5
    scores = _gqa_scores(q, k_cache).astype(jnp.float32) * scale  # [B,K,G,1,S]
    scores = jnp.where(valid_mask[:, None, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v_cache)
    return out.reshape(B, 1, H, D)
