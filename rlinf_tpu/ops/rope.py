"""Rotary position embeddings (HF Llama/Qwen2 layout: rotate_half pairing).

Computed in float32 regardless of activation dtype — RoPE phase error in
bfloat16 measurably degrades long-context logprobs, and the trig tables are
tiny relative to HBM traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_frequencies(
    head_dim: int,
    max_position: int,
    theta: float = 10000.0,
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape [max_position, head_dim].

    HF convention: inv_freq over even indices, duplicated across both halves
    (rotate_half), not interleaved.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [P, head_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [P, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Apply rotary embedding at ``positions``.

    q: [B, S, H, D], k: [B, S, K, D], positions: [B, S] int32.
    """
    cos_p = cos[positions][:, :, None, :]  # [B, S, 1, D]
    sin_p = sin[positions][:, :, None, :]
    orig_dtype = q.dtype
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = q32 * cos_p + _rotate_half(q32) * sin_p
    k_out = k32 * cos_p + _rotate_half(k32) * sin_p
    return q_out.astype(orig_dtype), k_out.astype(orig_dtype)
