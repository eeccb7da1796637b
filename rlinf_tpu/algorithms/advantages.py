"""Advantage estimators: GAE, GRPO, Reinforce++, OPD, raw.

Numerics match reference rlinf/algorithms/advantages.py:25-368 exactly (same
recursions, same eps constants, torch-default ddof=1 stds), implemented as
jit-safe ``lax.scan`` / vectorized ops instead of Python loops.

Shape conventions follow the reference:
  * time-major trajectories: rewards/values/dones as [T(,+1), B]
  * grouped LLM rewards: [num_prompts * group_size] with loss_mask [L, B]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.algorithms.registry import register_advantage
from rlinf_tpu.algorithms.utils import kl_penalty, masked_mean, safe_normalize


@register_advantage("gae")
def compute_gae_advantages_and_returns(
    rewards: jax.Array,
    gamma: float = 1.0,
    gae_lambda: float = 1.0,
    values: Optional[jax.Array] = None,
    normalize_advantages: bool = True,
    normalize_returns: bool = False,
    loss_mask: Optional[jax.Array] = None,
    dones: Optional[jax.Array] = None,
    **kwargs,
) -> Tuple[jax.Array, jax.Array]:
    """Generalized Advantage Estimation (reference advantages.py:25-87).

    Args:
      rewards: [T, B] float.
      values:  [T+1, B] or None (critic-free mode => gamma=lambda=1, advantage
               is reward-to-go).
      dones:   [T+1, B] episode-end flags; ``dones[t+1]`` gates bootstrap at t.
      loss_mask: [T, B] mask for normalization statistics.
    Returns:
      (advantages [T, B], returns [T, B])
    """
    rewards = rewards.astype(jnp.float32)
    T = rewards.shape[0]
    critic_free = values is None
    if critic_free:
        gamma, gae_lambda = 1.0, 1.0
        values_next = jnp.zeros_like(rewards)
        values_cur = jnp.zeros_like(rewards)
    else:
        values = values.astype(jnp.float32)
        values_next = values[1:]
        values_cur = values[:-1]
    if dones is None:
        not_done_next = jnp.ones_like(rewards)
    else:
        not_done_next = 1.0 - dones[1:].astype(jnp.float32)

    if critic_free:
        delta = rewards
    else:
        delta = rewards + gamma * values_next * not_done_next - values_cur

    def scan_fn(gae, xs):
        d, nd = xs
        gae = d + gamma * gae_lambda * nd * gae
        return gae, gae

    _, gaes = jax.lax.scan(
        scan_fn, jnp.zeros_like(rewards[0]), (delta, not_done_next), reverse=True
    )

    if critic_free:
        returns = gaes
        advantages = returns
    else:
        returns = gaes + values_cur
        advantages = returns - values_cur

    if normalize_advantages:
        advantages = safe_normalize(advantages, loss_mask=loss_mask)
    if normalize_returns:
        returns = safe_normalize(returns, loss_mask=loss_mask)
    return advantages, returns


@register_advantage("grpo")
def compute_grpo_advantages(
    rewards: jax.Array,
    loss_mask: jax.Array,
    group_size: int,
    **kwargs,
) -> Tuple[jax.Array, None]:
    """Group-relative baseline (reference advantages.py:90-121).

    rewards: [num_prompts * group_size] (or [num_prompts, group_size]);
    loss_mask: [L, B] token mask (B = num_prompts * group_size).
    Per-group standardization uses torch-default ddof=1 std and eps=1e-6.
    """
    rewards = rewards.astype(jnp.float32).reshape(-1, group_size)
    mean = jnp.mean(rewards, axis=-1, keepdims=True)
    # ddof=1 to match torch Tensor.std default used by the reference.
    var = jnp.sum(jnp.square(rewards - mean), axis=-1, keepdims=True) / jnp.maximum(
        group_size - 1, 1
    )
    std = jnp.sqrt(var)
    adv = (rewards - mean) / (std + 1e-6)
    adv = adv.reshape(1, -1)
    advantages = adv * loss_mask.astype(jnp.float32)
    return advantages, None


@register_advantage("reinpp")
def compute_reinpp_advantages(
    rewards: jax.Array,
    loss_mask: jax.Array,
    group_size: int,
    use_reinpp_baseline: bool = False,
    kl_beta: float = 0.0,
    logprob: Optional[jax.Array] = None,
    ref_logprob: Optional[jax.Array] = None,
    kl_penalty_type: str = "k1",
    **kwargs,
) -> Tuple[jax.Array, None]:
    """Reinforce++ (reference advantages.py:260-325): terminal reward scattered
    at EOS, optional per-token KL shaping, reverse-cumsum returns, masked
    whitening with rsqrt(clamped var)."""
    rewards = rewards.astype(jnp.float32).reshape(-1)
    if use_reinpp_baseline:
        grouped = rewards.reshape(-1, group_size)
        rewards = (grouped - jnp.mean(grouped, axis=1, keepdims=True)).reshape(-1)

    L, B = loss_mask.shape
    mask_f = loss_mask.astype(jnp.float32)
    # Index of last valid token per sequence (argmax of flipped mask).
    eos_idx = L - 1 - jnp.argmax(mask_f[::-1], axis=0)  # [B]
    r_matrix = jnp.zeros((L, B), jnp.float32)
    r_matrix = r_matrix.at[eos_idx, jnp.arange(B)].set(rewards)

    if kl_beta > 0:
        kld = kl_penalty(logprob, ref_logprob, kl_penalty_type)
        r_matrix = r_matrix - kl_beta * kld

    ret = jnp.cumsum(r_matrix[::-1], axis=0)[::-1]

    mean = masked_mean(ret, loss_mask)
    var = masked_mean(jnp.square(ret - mean), loss_mask)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 1e-8))
    return (ret - mean) * rstd, None


@register_advantage("opd")
def compute_opd_advantages(
    prev_logprobs: jax.Array,
    teacher_logprobs: jax.Array,
    loss_mask: Optional[jax.Array] = None,
    num_action_chunks: Optional[int] = None,
    **kwargs,
) -> Tuple[jax.Array, None]:
    """On-policy distillation: reverse-KL dense reward teacher_lp - student_lp
    (reference advantages.py:325-368)."""
    assert num_action_chunks is not None
    adv = teacher_logprobs.astype(jnp.float32) - prev_logprobs.astype(jnp.float32)
    adv = adv.reshape(*adv.shape[:-1], num_action_chunks, -1)
    if loss_mask is not None:
        adv = adv[: loss_mask.shape[0]]
    return adv, None


@register_advantage("raw")
def compute_raw_advantages(
    rewards: jax.Array,
    loss_mask: jax.Array,
    normalize_advantages: bool = False,
    **kwargs,
) -> Tuple[jax.Array, None]:
    """Broadcast per-sequence reward to all tokens (reference advantages.py:368+)."""
    rewards = rewards.astype(jnp.float32).reshape(-1)
    adv = rewards[None, :] * loss_mask.astype(jnp.float32)
    if normalize_advantages:
        adv = safe_normalize(adv, loss_mask)
        adv = adv * loss_mask.astype(jnp.float32)
    return adv, None


@register_advantage("grpo_dynamic")
def compute_grpo_dynamic_advantages(
    rewards: jax.Array,
    loss_mask: jax.Array,
    group_size: int,
    idx_to_traj,
    advantage_mode: str = "turn",
    **kwargs,
) -> Tuple[jax.Array, None]:
    """Multi-turn/multi-agent GRPO (reference advantages.py:125-260):
    per-QUESTION normalization where each question owns ``group_size``
    trajectories and each trajectory spans one or more turns.

    rewards: [num_turns] (or [num_turns, 1]); loss_mask: [L, num_turns];
    idx_to_traj: turn index -> global trajectory index (python list — static
    under jit, matching the reference's host-side preprocessing).
    """
    import numpy as np

    rewards = rewards.astype(jnp.float32).reshape(-1)
    idx_to_traj = np.asarray(idx_to_traj, np.int32)
    num_turns = len(idx_to_traj)
    num_traj = int(idx_to_traj.max()) + 1
    assert num_traj % group_size == 0
    num_questions = num_traj // group_size
    turn_onehot = jax.nn.one_hot(
        jnp.asarray(idx_to_traj), num_traj, dtype=jnp.float32
    )  # [turns, traj]

    if advantage_mode == "trajectory":
        counts = jnp.maximum(jnp.sum(turn_onehot, axis=0), 1.0)
        traj_rewards = (rewards @ turn_onehot) / counts       # [traj]
        grouped = traj_rewards.reshape(num_questions, group_size)
        mean = jnp.mean(grouped, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(grouped - mean), axis=-1, keepdims=True) / \
            jnp.maximum(group_size - 1, 1)
        normalized = ((grouped - mean) / (jnp.sqrt(var) + 1e-6)).reshape(-1)
        turn_adv = turn_onehot @ normalized                   # broadcast back
    elif advantage_mode == "turn":
        turn_to_q = jnp.asarray(idx_to_traj // group_size)
        q_onehot = jax.nn.one_hot(turn_to_q, num_questions, dtype=jnp.float32)
        n_q = jnp.maximum(jnp.sum(q_onehot, axis=0), 1.0)     # turns/question
        mean_q = (rewards @ q_onehot) / n_q
        centered = rewards - q_onehot @ mean_q
        var_q = (jnp.square(centered) @ q_onehot) / jnp.maximum(n_q - 1.0, 1.0)
        std_q = jnp.sqrt(var_q)
        turn_adv = centered / (q_onehot @ std_q + 1e-6)
    else:
        raise ValueError(f"invalid advantage_mode {advantage_mode!r}")

    adv = turn_adv[None, :] * loss_mask.astype(jnp.float32)
    return adv, None
