"""Policy / value losses: PPO clip (+dual-clip), decoupled PPO, critic, OPD, GRPO.

Numerics match reference rlinf/algorithms/losses.py:27-560. All inputs are
promoted to float32 (the reference asserts fp32; under jit we enforce by
casting). Every loss returns ``(loss, metrics_dict)`` with the same metric
keys as the reference so parity harnesses can compare logs.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.algorithms.registry import register_policy_loss
from rlinf_tpu.algorithms.utils import (
    huber_loss,
    masked_mean,
    masked_mean_ratio,
)


def _f32(x):
    return None if x is None else x.astype(jnp.float32)


def _agg(values, mask, loss_mask_ratio, loss_agg_func):
    if loss_mask_ratio is not None:
        return masked_mean_ratio(values, mask, loss_mask_ratio)
    return loss_agg_func(values, mask)


def compute_ppo_actor_loss(
    logprobs: jax.Array,
    old_logprobs: jax.Array,
    clip_ratio_low: float,
    clip_ratio_high: float,
    advantages: jax.Array,
    loss_mask: Optional[jax.Array] = None,
    clip_ratio_c: Optional[float] = None,
    loss_agg_func: Callable = masked_mean,
    max_episode_steps: Optional[int] = None,
    loss_mask_sum: Optional[jax.Array] = None,
    critic_warmup: bool = False,
    clip_log_ratio_min: Optional[float] = None,
    clip_log_ratio_max: Optional[float] = None,
    **kwargs,
) -> Tuple[jax.Array, dict]:
    """PPO-clip actor loss with optional dual-clip (reference losses.py:170-312).

    loss = max(-A*r, -A*clip(r, 1-lo, 1+hi)); dual-clip floors the loss at
    sign(A)*c*A when that is smaller (for strongly negative advantages).
    """
    logprobs, old_logprobs, advantages = (
        _f32(logprobs),
        _f32(old_logprobs),
        _f32(advantages),
    )
    if loss_mask is None:
        loss_mask = jnp.ones_like(logprobs, dtype=bool)
    loss_mask_b = loss_mask.astype(bool)
    mask_f = loss_mask.astype(jnp.float32)

    loss_mask_ratio = None
    if max_episode_steps is not None and loss_mask_sum is not None:
        loss_mask_ratio = loss_mask_sum.astype(jnp.float32) / max_episode_steps

    count = jnp.maximum(jnp.sum(mask_f), 1.0)
    log_ratio = logprobs - old_logprobs
    if clip_log_ratio_min is not None:
        log_ratio = jnp.maximum(log_ratio, clip_log_ratio_min)
    if clip_log_ratio_max is not None:
        log_ratio = jnp.minimum(log_ratio, clip_log_ratio_max)
    ratio = jnp.where(loss_mask_b, jnp.exp(log_ratio), 0.0)
    approx_kl_terms = jnp.where(loss_mask_b, jax.lax.stop_gradient(log_ratio), 0.0)

    clipped_ratio = jnp.clip(ratio, 1.0 - clip_ratio_low, 1.0 + clip_ratio_high)
    pg1 = -advantages * ratio
    pg2 = -advantages * clipped_ratio
    policy_loss = jnp.maximum(pg1, pg2)
    clip_mask = jax.lax.stop_gradient(pg1) < jax.lax.stop_gradient(pg2)

    if clip_ratio_c is not None:
        assert clip_ratio_c > 1.0, "clip_ratio_c must be > 1.0"
        pg3 = jnp.sign(advantages) * clip_ratio_c * advantages
        dual_clip_mask = jax.lax.stop_gradient(pg3) < jax.lax.stop_gradient(policy_loss)
        policy_loss = jnp.minimum(policy_loss, pg3)
    else:
        dual_clip_mask = jnp.zeros_like(clip_mask)

    metric_loss_abs = _agg(jnp.abs(policy_loss), mask_f, loss_mask_ratio, loss_agg_func)
    loss = _agg(policy_loss, mask_f, loss_mask_ratio, loss_agg_func)

    dual_clip_mask = dual_clip_mask & loss_mask_b
    clip_fraction = jnp.sum(clip_mask & loss_mask_b) / count
    approx_kl = -jnp.sum(approx_kl_terms) / count
    dual_clipped_ratio = jnp.where(dual_clip_mask, ratio, 0.0)

    if critic_warmup:
        loss = jnp.zeros_like(loss)

    metrics = {
        "actor/policy_loss": jax.lax.stop_gradient(loss),
        "actor/policy_loss_abs": jax.lax.stop_gradient(metric_loss_abs),
        "actor/ratio": masked_mean(jax.lax.stop_gradient(ratio), mask_f),
        "actor/ratio_abs": masked_mean(
            jnp.abs(jax.lax.stop_gradient(ratio) - 1.0), mask_f
        ),
        "actor/clipped_ratio": masked_mean(
            jax.lax.stop_gradient(clipped_ratio), mask_f
        ),
        "actor/dual_cliped_ratio": masked_mean(
            jax.lax.stop_gradient(dual_clipped_ratio), mask_f
        ),
        "actor/approx_kl": approx_kl,
        "actor/clip_fraction": clip_fraction.astype(jnp.float32),
    }
    return loss, metrics


def compute_decoupled_ppo_actor_loss(
    logprobs: jax.Array,
    old_logprobs: jax.Array,
    clip_ratio_low: float,
    clip_ratio_high: float,
    advantages: jax.Array,
    proximal_logprobs: Optional[jax.Array] = None,
    versions: Optional[jax.Array] = None,
    current_version: Optional[float] = None,
    loss_mask: Optional[jax.Array] = None,
    clip_ratio_c: Optional[float] = None,
    loss_agg_func: Callable = masked_mean,
    max_episode_steps: Optional[int] = None,
    loss_mask_sum: Optional[jax.Array] = None,
    critic_warmup: bool = False,
    behave_weight_threshold: Optional[float] = None,
    **kwargs,
) -> Tuple[jax.Array, dict]:
    """Decoupled PPO (behavior != proximal policy) for async off-policy rollouts
    (reference losses.py:27-168). The proximal anchor is interpolated from
    version lag: alpha = (v_prox - v_behav) / (v_theta - v_behav)."""
    logprobs, old_logprobs, advantages = (
        _f32(logprobs),
        _f32(old_logprobs),
        _f32(advantages),
    )
    if loss_mask is None:
        loss_mask = jnp.ones_like(logprobs, dtype=bool)
    loss_mask_b = loss_mask.astype(bool)
    mask_f = loss_mask.astype(jnp.float32)

    loss_mask_ratio = None
    if max_episode_steps is not None and loss_mask_sum is not None:
        loss_mask_ratio = loss_mask_sum.astype(jnp.float32) / max_episode_steps

    if proximal_logprobs is None:
        if versions is None or current_version is None:
            proximal_logprobs = jax.lax.stop_gradient(old_logprobs)
        else:
            v_behav = versions.astype(jnp.float32)
            v_theta = jnp.asarray(current_version, jnp.float32)
            v_prox = v_theta - 1.0
            version_diff = v_theta - v_behav
            version_gap = v_prox - v_behav
            generated = versions >= 0
            alpha = jnp.where(
                (version_diff > 0) & generated, version_gap / version_diff, 0.0
            )
            while alpha.ndim < logprobs.ndim:
                alpha = alpha[..., None]
            alpha = jnp.clip(alpha, 0.0, 1.0)
            proximal_logprobs = jax.lax.stop_gradient(
                old_logprobs + alpha * (logprobs - old_logprobs)
            )
    proximal_logprobs = _f32(proximal_logprobs)

    count = jnp.maximum(jnp.sum(mask_f), 1.0)
    proximal_ratio = jnp.where(loss_mask_b, jnp.exp(logprobs - proximal_logprobs), 0.0)
    clipped = jnp.clip(proximal_ratio, 1.0 - clip_ratio_low, 1.0 + clip_ratio_high)
    pg1 = -advantages * proximal_ratio
    pg2 = -advantages * clipped
    pg = jnp.maximum(pg1, pg2)

    if clip_ratio_c is not None:
        assert clip_ratio_c > 1.0
        pg3 = jnp.sign(advantages) * clip_ratio_c * advantages
        dual_clip_mask = jax.lax.stop_gradient(pg3) < jax.lax.stop_gradient(pg)
        pg = jnp.minimum(pg, pg3)
    else:
        dual_clip_mask = jnp.zeros_like(pg, dtype=bool)

    behav_weight = jnp.exp(proximal_logprobs - old_logprobs)
    if behave_weight_threshold is not None:
        behav_mask = (behav_weight <= behave_weight_threshold) & loss_mask_b
    else:
        behav_mask = loss_mask_b
    behav_count = jnp.maximum(jnp.sum(behav_mask.astype(jnp.float32)), 1.0)

    loss = _agg(
        pg * behav_weight, behav_mask.astype(jnp.float32), loss_mask_ratio, loss_agg_func
    )
    if critic_warmup:
        loss = jnp.zeros_like(loss)

    clip_fraction = (
        jnp.sum((jax.lax.stop_gradient(pg1) < jax.lax.stop_gradient(pg2)) & loss_mask_b)
        / count
    )
    dual_clip_fraction = jnp.sum(dual_clip_mask & loss_mask_b) / count
    proximal_approx_kl = (
        -jnp.sum(jnp.where(loss_mask_b, logprobs - proximal_logprobs, 0.0)) / count
    )
    behav_approx_kl = (
        -jnp.sum(jnp.where(behav_mask, proximal_logprobs - old_logprobs, 0.0))
        / behav_count
    )

    metrics = {
        "actor/policy_loss": jax.lax.stop_gradient(loss),
        "actor/proximal_ratio": masked_mean(
            jax.lax.stop_gradient(proximal_ratio), mask_f
        ),
        "actor/clipped_proximal_ratio": masked_mean(
            jax.lax.stop_gradient(clipped), mask_f
        ),
        "actor/clip_fraction": clip_fraction.astype(jnp.float32),
        "actor/dual_clip_fraction": dual_clip_fraction.astype(jnp.float32),
        "actor/behav_clip_fraction": 1.0 - behav_count / count,
        "actor/proximal_approx_kl": jax.lax.stop_gradient(proximal_approx_kl),
        "actor/behav_approx_kl": jax.lax.stop_gradient(behav_approx_kl),
    }
    return loss, metrics


def compute_ppo_critic_loss(
    values: jax.Array,
    returns: jax.Array,
    prev_values: jax.Array,
    value_clip: float,
    huber_delta: float,
    loss_mask: Optional[jax.Array] = None,
    max_episode_steps: Optional[int] = None,
    loss_mask_sum: Optional[jax.Array] = None,
    **kwargs,
) -> Tuple[jax.Array, dict]:
    """Clipped-value huber critic loss (reference losses.py:315-381)."""
    values, returns, prev_values = _f32(values), _f32(returns), _f32(prev_values)
    loss_mask_ratio = None
    if max_episode_steps is not None and loss_mask_sum is not None and loss_mask is not None:
        loss_mask_ratio = loss_mask_sum.astype(jnp.float32) / max_episode_steps
    if loss_mask is None:
        loss_mask = jnp.ones_like(values, dtype=bool)
    mask_f = loss_mask.astype(jnp.float32)

    clipped_values = prev_values + jnp.clip(values - prev_values, -value_clip, value_clip)
    vloss1 = huber_loss(returns - values, huber_delta)
    vloss2 = huber_loss(returns - clipped_values, huber_delta)
    vloss = jnp.maximum(vloss1, vloss2)
    loss = _agg(vloss, mask_f, loss_mask_ratio, masked_mean)

    clip_indicator = jnp.abs(clipped_values - prev_values) > value_clip
    clip_ratio = jnp.mean(clip_indicator.astype(jnp.float32))

    # Explained variance over the mask (reference metric_utils).
    ret_mean = masked_mean(returns, mask_f)
    ret_var = masked_mean(jnp.square(returns - ret_mean), mask_f)
    err_var = masked_mean(jnp.square(returns - values), mask_f)
    explained_var = 1.0 - err_var / jnp.maximum(ret_var, 1e-8)

    metrics = {
        "critic/value_loss": jax.lax.stop_gradient(loss),
        "critic/value_clip_ratio": jax.lax.stop_gradient(clip_ratio),
        "critic/explained_variance": jax.lax.stop_gradient(explained_var),
    }
    return loss, metrics


@register_policy_loss("actor")
def compute_grpo_actor_loss_fn(**kwargs):
    """GRPO uses the PPO-clip actor loss (reference losses.py:509-560)."""
    return compute_ppo_actor_loss(**kwargs)


@register_policy_loss("ppo_actor")
def _ppo_actor(**kwargs):
    return compute_ppo_actor_loss(**kwargs)


@register_policy_loss("actor_critic")
def compute_ppo_actor_critic_loss(**kwargs):
    actor_loss, am = compute_ppo_actor_loss(**kwargs)
    critic_loss, cm = compute_ppo_critic_loss(**kwargs)
    metrics = {**am, **cm}
    return actor_loss + critic_loss, metrics


@register_policy_loss("decoupled_actor_critic")
def compute_decoupled_ppo_actor_critic_loss(**kwargs):
    actor_loss, am = compute_decoupled_ppo_actor_loss(**kwargs)
    critic_loss, cm = compute_ppo_critic_loss(**kwargs)
    metrics = {**am, **cm}
    return actor_loss + critic_loss, metrics


@register_policy_loss("decoupled_actor")
def _decoupled_actor(**kwargs):
    return compute_decoupled_ppo_actor_loss(**kwargs)


@register_policy_loss("opd")
def compute_opd_actor_loss(
    logprobs: jax.Array,
    advantages: jax.Array,
    loss_mask: jax.Array,
    loss_mask_sum: Optional[jax.Array] = None,
    max_episode_steps: Optional[int] = None,
    loss_agg_func: Callable = masked_mean,
    **kwargs,
) -> Tuple[jax.Array, dict]:
    """OPD distillation: -logprob * stop_grad(reverse-KL reward)
    (reference losses.py:428-508)."""
    logprobs, advantages = _f32(logprobs), _f32(advantages)
    if loss_mask.ndim == logprobs.ndim - 1:
        loss_mask = loss_mask[..., None]
    loss_mask = jnp.broadcast_to(loss_mask, logprobs.shape)
    mask_f = loss_mask.astype(jnp.float32)

    loss_mask_ratio = None
    if max_episode_steps is not None and loss_mask_sum is not None:
        if loss_mask_sum.ndim == logprobs.ndim - 1:
            loss_mask_sum = loss_mask_sum[..., None]
        loss_mask_sum = jnp.broadcast_to(loss_mask_sum, logprobs.shape)
        loss_mask_ratio = loss_mask_sum.astype(jnp.float32) / max_episode_steps

    opd_rewards = jax.lax.stop_gradient(advantages)
    loss = _agg(-logprobs * opd_rewards, mask_f, loss_mask_ratio, loss_agg_func)

    metrics = {
        "actor/policy_loss": jax.lax.stop_gradient(loss),
        "actor/opd_reward": masked_mean(opd_rewards, mask_f),
        "actor/opd_reverse_kl": masked_mean(-opd_rewards, mask_f),
    }
    return loss, metrics
