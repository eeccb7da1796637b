"""Shared flow-matching / flow-SDE machinery over action CHUNKS.

Generalizes the per-vector flow ops of ``flow_policy.py`` to arbitrary
action shapes [B, K, A] (chunked VLA actions), parameterized by a
``velocity_fn(x_t, t) -> v`` closure so pi0 / gr00t / starvla-style heads can
share one exact-logprob denoising-MDP implementation.

Reference analog: the flow-matching sampling + flow-SDE RL construction used
by the openpi pi0/pi0.5 policies and starvla's flowmatching action head
(reference rlinf/models/embodiment/openpi, starvla/action_heads/
flowmatching.py; piRL recipe, docs pi_rl.rst:41-89). Each SDE step
x_{k+1} = x_k + dt*v + sigma*sqrt(dt)*eps is a Gaussian whose logprob is
exact, so PPO importance ratios over the denoising chain are well-defined.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)

VelocityFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x_t [B,...], t [B])


class ChunkFlowChain(NamedTuple):
    """Denoising-MDP record for chunked actions."""

    actions: jax.Array   # [B, K, A] final x1
    chain: jax.Array     # [B, steps+1, K, A]
    logprobs: jax.Array  # [B, steps]


def time_embed(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of t in [0,1]; t: [...] -> [..., dim]."""
    half = dim // 2
    freqs = jnp.exp(jnp.linspace(0.0, math.log(1000.0), half))
    ang = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def flow_matching_loss(
    velocity_fn: VelocityFn,
    rng: jax.Array,
    target: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Conditional flow matching: E_t ||v(x_t,t) - (x1-x0)||^2, x1=target."""
    B = target.shape[0]
    k_noise, k_t = jax.random.split(rng)
    x1 = target.astype(jnp.float32)
    x0 = jax.random.normal(k_noise, x1.shape, jnp.float32)
    t = jax.random.uniform(k_t, (B,), jnp.float32)
    t_b = t.reshape((B,) + (1,) * (x1.ndim - 1))
    x_t = (1.0 - t_b) * x0 + t_b * x1
    v = velocity_fn(x_t, t)
    err = jnp.square(v - (x1 - x0))
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)
    return jnp.mean(err)


def sample_ode(
    velocity_fn: VelocityFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    *,
    steps: int,
) -> jax.Array:
    """Deterministic Euler ODE integration from N(0,I) (eval-mode action)."""
    B = shape[0]
    x = jax.random.normal(rng, shape, jnp.float32)
    dt = 1.0 / steps

    def body(i, x):
        t = jnp.full((B,), i * dt, jnp.float32)
        return x + dt * velocity_fn(x, t)

    return jax.lax.fori_loop(0, steps, body, x)


def sample_sde(
    velocity_fn: VelocityFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    *,
    steps: int,
    noise_scale: float,
) -> ChunkFlowChain:
    """Flow-SDE sampling with exact per-step chain logprobs (summed over the
    action dims of each step's Gaussian)."""
    B = shape[0]
    dt = 1.0 / steps
    std = noise_scale * math.sqrt(dt)
    k_init, k_steps = jax.random.split(rng)
    x0 = jax.random.normal(k_init, shape, jnp.float32)
    dims = tuple(range(1, len(shape)))

    def body(carry, inputs):
        x, i = carry
        key = inputs
        t = jnp.full((B,), i * dt, jnp.float32)
        mean = x + dt * velocity_fn(x, t)
        eps = jax.random.normal(key, shape, jnp.float32)
        x_next = mean + std * eps
        lp = jnp.sum(
            -0.5 * jnp.square(eps) - math.log(std) - 0.5 * _LOG_2PI, axis=dims
        )
        return (x_next, i + 1.0), (x_next, lp)

    keys = jax.random.split(k_steps, steps)
    (x_final, _), (chain, lps) = jax.lax.scan(body, (x0, jnp.zeros(())), keys)
    chain_full = jnp.concatenate([x0[None], chain], axis=0)  # [S+1, B, ...]
    return ChunkFlowChain(
        actions=x_final,
        chain=jnp.moveaxis(chain_full, 0, 1),
        logprobs=lps.T,
    )


def chain_logprobs(
    velocity_fn: VelocityFn,
    chain: jax.Array,
    *,
    noise_scale: float,
    remat: bool = False,
) -> jax.Array:
    """Per-step logprobs of a stored chain [B, S+1, ...] under CURRENT params
    (the PPO 'new logprob' recompute). Returns [B, S].

    ``remat``: rematerialize each step's velocity pass in the backward —
    without it the S unrolled expert passes all keep their activations live
    (measured: the dominant share of a 4GB+ bwd workspace at pi0 full
    geometry), with it the peak is one pass."""
    B, S1 = chain.shape[:2]
    steps = S1 - 1
    dt = 1.0 / steps
    std = noise_scale * math.sqrt(dt)
    dims = tuple(range(1, chain.ndim - 1))
    vfn = jax.checkpoint(velocity_fn) if remat else velocity_fn

    def step_lp(i, _):
        x_k = chain[:, i]
        x_next = chain[:, i + 1]
        t = jnp.full((B,), i * dt, jnp.float32)
        mean = x_k + dt * vfn(x_k, t)
        z = (x_next - mean) / std
        lp = jnp.sum(
            -0.5 * jnp.square(z) - math.log(std) - 0.5 * _LOG_2PI, axis=dims
        )
        return None, lp

    # python loop: steps is small & static; keeps velocity_fn free to close
    # over cached prefix KV without scan-carry plumbing
    lps = [step_lp(i, None)[1] for i in range(steps)]
    return jnp.stack(lps, axis=-1)


def chain_entropy_like(lp: jax.Array, action_size: int, steps: int,
                       noise_scale: float) -> jax.Array:
    """Entropy of each (constant-variance) denoising Gaussian, shaped like
    the per-step logprob array."""
    std = noise_scale * math.sqrt(1.0 / steps)
    return jnp.full_like(
        lp, action_size * (math.log(std) + 0.5 * (_LOG_2PI + 1.0))
    )
