"""DrQ-style image augmentation, jit-native.

Reference analog: rlinf/utils/drq.py (random-shift crop with replicate
padding, torch unfold gather). Here the batched random crop is a single
vmapped ``dynamic_slice`` over a replicate-padded canvas — fuses into the
surrounding jitted training step instead of a host-side gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drq_random_shift(rng: jax.Array, images: jax.Array, pad: int = 4
                     ) -> jax.Array:
    """Random-shift crop (DrQ): replicate-pad by ``pad`` then crop back to
    the original size at a per-sample random offset.

    images: [B, H, W, C] (BHWC, float or uint8). Returns same shape/dtype.
    """
    B, H, W, C = images.shape
    padded = jnp.pad(
        images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
    )
    k1, k2 = jax.random.split(rng)
    tops = jax.random.randint(k1, (B,), 0, 2 * pad + 1)
    lefts = jax.random.randint(k2, (B,), 0, 2 * pad + 1)

    def crop(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left, 0), (H, W, C))

    return jax.vmap(crop)(padded, tops, lefts)


def drq_crop_main(rng: jax.Array, x: jax.Array, pad: int = 4) -> jax.Array:
    """Accepts BHWC or BCHW (3-channel), mirroring the reference's
    drq_crop_main layout dispatch (drq.py:38-50)."""
    if x.ndim != 4:
        raise ValueError(f"expected 4D images, got {x.shape}")
    if x.shape[-1] == 3:
        return drq_random_shift(rng, x, pad)
    if x.shape[1] == 3:
        y = drq_random_shift(rng, x.transpose(0, 2, 3, 1), pad)
        return y.transpose(0, 3, 1, 2)
    raise ValueError(f"cannot infer layout of {x.shape}")
