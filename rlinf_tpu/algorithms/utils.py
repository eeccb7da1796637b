"""Masked reductions, KL approximations, and normalization helpers.

Numerics match reference rlinf/utils/utils.py:309-342 (masked_mean family) and
rlinf/algorithms/utils.py:20-64 (huber_loss, kl_penalty k1/k2/k3/abs,
safe_normalize). Standard deviations use ddof=1 (Bessel) wherever the
reference uses torch's default ``Tensor.std``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def masked_mean(values, mask, axis=None, _ratio=None):
    """Mean over entries where mask is nonzero; 0 if the mask is empty.

    Matches reference masked_mean (rlinf/utils/utils.py:309): an all-false mask
    yields masked_sum (i.e. 0) rather than NaN.
    """
    if mask is None:
        return jnp.mean(values, axis=axis)
    mask = mask.astype(values.dtype)
    total = jnp.sum(mask, axis=axis)
    s = jnp.sum(values * mask, axis=axis)
    return jnp.where(total > 0, s / jnp.maximum(total, 1.0), s)


def masked_sum(values, mask, axis=None):
    return jnp.sum(values * mask.astype(values.dtype), axis=axis)


def masked_mean_ratio(values, mask, loss_mask_ratio):
    """Embodied-task aggregation (reference rlinf/utils/utils.py:338):
    per-sample normalization by (valid steps / max episode steps)."""
    mask = mask.astype(values.dtype)
    return jnp.mean(values / loss_mask_ratio * mask)


def seq_mean_token_sum(values, mask, axis=-1):
    return jnp.mean(jnp.sum(values * mask.astype(values.dtype), axis=axis))


def seq_mean_token_mean(values, mask, axis=-1):
    mask = mask.astype(values.dtype)
    denom = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return jnp.mean(jnp.sum(values * mask, axis=axis) / denom)


def get_loss_agg_func(loss_agg: str) -> Callable:
    """Mirror of reference get_loss_agg_func (rlinf/utils/utils.py:345)."""
    if loss_agg == "token-mean":
        return masked_mean
    if loss_agg == "seq-mean-token-sum":
        return lambda v, m, *_: seq_mean_token_sum(v, m)
    if loss_agg == "seq-mean-token-mean":
        return lambda v, m, *_: seq_mean_token_mean(v, m)
    raise ValueError(f"Unknown loss_agg {loss_agg!r}")


def huber_loss(error, delta: float):
    abs_err = jnp.abs(error)
    return jnp.where(abs_err < delta, 0.5 * error**2, delta * (abs_err - 0.5 * delta))


def kl_penalty(logprob, ref_logprob, kl_penalty_type: str):
    """Token-level KL estimators (k1/k2/k3 of Schulman's blog; reference
    rlinf/algorithms/utils.py:26-64)."""
    if kl_penalty_type in ("kl", "k1"):
        return logprob - ref_logprob
    if kl_penalty_type == "abs":
        return jnp.abs(logprob - ref_logprob)
    if kl_penalty_type in ("mse", "k2"):
        return 0.5 * jnp.square(logprob - ref_logprob)
    if kl_penalty_type in ("low_var_kl", "k3"):
        kl = jnp.clip(ref_logprob - logprob, -20.0, 20.0)
        kld = jnp.exp(kl) - kl - 1.0
        return jnp.clip(kld, -10.0, 10.0)
    raise NotImplementedError(f"kl_penalty {kl_penalty_type!r}")


def _masked_std(array, mask, eps=0.0, ddof=1):
    mask = mask.astype(array.dtype)
    n = jnp.sum(mask)
    mean = jnp.sum(array * mask) / jnp.maximum(n, 1.0)
    var = jnp.sum(jnp.square(array - mean) * mask) / jnp.maximum(n - ddof, 1.0)
    return mean, jnp.sqrt(var)


def safe_normalize(array, loss_mask=None, eps: float = 1e-5):
    """(x - mean) / (std + eps) over masked entries, identity on empty mask.

    Matches reference safe_normalize (rlinf/algorithms/utils.py:397): mean/std
    computed over valid entries only (std with ddof=1), but the shift/scale is
    applied to every entry.
    """
    if loss_mask is None:
        loss_mask = jnp.ones_like(array, dtype=bool)
    mean, std = _masked_std(array, loss_mask)
    n = jnp.sum(loss_mask.astype(jnp.int32))
    normalized = (array - mean) / (std + eps)
    return jnp.where(n > 0, normalized, array)
