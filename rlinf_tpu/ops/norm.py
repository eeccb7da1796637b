"""RMSNorm, computed in float32 with cast-back (HF Qwen2/Llama semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) * scale; statistics in fp32.

    XLA fuses this into neighbouring matmuls on TPU; a hand-written Pallas
    kernel buys nothing here (VPU-bound, single pass), so this stays XLA.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(orig_dtype)
