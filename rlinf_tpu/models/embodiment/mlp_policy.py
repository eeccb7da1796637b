"""Gaussian MLP actor-critic (reference: rlinf/models/embodiment/mlp_policy/
mlp_policy.py — MLP backbone, mean head, state-independent logstd, value head).

Matches the reference's distribution semantics: per-dimension Normal
logprob/entropy (not summed — the PPO loss masks/aggregates over the action
dim), tanh-free actions clipped by the env.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput

_LOG_2PI = math.log(2.0 * math.pi)


def _mlp_init(rng, sizes: Sequence[int], scale_last: Optional[float] = 0.01):
    """Uniform fan-in init; final layer optionally down-scaled (policy heads
    start near-deterministic-zero, the standard PPO init)."""
    params = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        scale = 1.0 / math.sqrt(fan_in)
        if i == len(sizes) - 2 and scale_last is not None:
            scale = scale * scale_last
        w = jax.random.uniform(
            keys[i], (fan_in, fan_out), jnp.float32, -1.0, 1.0
        ) * scale
        b = jnp.zeros((fan_out,), jnp.float32)
        params.append({"w": w, "b": b})
    return params


def _mlp_apply(layers, x, activation=jax.nn.tanh, final_activation=None):
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i < len(layers) - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def gaussian_logprob(mean, logstd, actions):
    """Per-dimension Normal logprob, fp32."""
    std = jnp.exp(logstd)
    z = (actions - mean) / std
    return -0.5 * jnp.square(z) - logstd - 0.5 * _LOG_2PI


def gaussian_entropy(logstd):
    return logstd + 0.5 * (_LOG_2PI + 1.0)


class MLPGaussianPolicy(Policy):
    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        hidden_sizes: Sequence[int] = (64, 64),
        obs_key: str = "states",
        init_logstd: float = 0.0,
        with_value_head: bool = True,
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.hidden_sizes = tuple(hidden_sizes)
        self.obs_key = obs_key
        self.init_logstd = init_logstd
        self.with_value_head = with_value_head

    def init(self, rng: jax.Array):
        k1, k2, k3 = jax.random.split(rng, 3)
        sizes = (self.obs_dim, *self.hidden_sizes)
        params = {
            "backbone": _mlp_init(k1, sizes, scale_last=None),
            "actor_mean": _mlp_init(
                k2, (self.hidden_sizes[-1], self.action_dim), scale_last=0.01
            ),
            "actor_logstd": jnp.full((self.action_dim,), self.init_logstd, jnp.float32),
        }
        if self.with_value_head:
            params["value"] = _mlp_init(
                k3, (self.obs_dim, *self.hidden_sizes, 1), scale_last=1.0
            )
        return params

    # ------------------------------------------------------------------
    def _dist(self, params, obs):
        x = obs[self.obs_key].astype(jnp.float32)
        feat = _mlp_apply(params["backbone"], x)
        mean = _mlp_apply(params["actor_mean"], feat)
        logstd = jnp.broadcast_to(params["actor_logstd"], mean.shape)
        return mean, logstd

    def value(self, params, obs):
        x = obs[self.obs_key].astype(jnp.float32)
        return _mlp_apply(params["value"], x)[..., 0]

    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        mean, logstd = self._dist(params, obs)
        out = {
            "logprobs": gaussian_logprob(mean, logstd, actions.astype(jnp.float32)),
            "entropy": gaussian_entropy(logstd),
        }
        if self.with_value_head:
            out["values"] = self.value(params, obs)
        return out

    def predict_action_batch(
        self, params, rng, obs, *, deterministic: bool = False
    ) -> PolicyOutput:
        mean, logstd = self._dist(params, obs)
        if deterministic:
            actions = mean
        else:
            noise = jax.random.normal(rng, mean.shape, jnp.float32)
            actions = mean + jnp.exp(logstd) * noise
        logprobs = gaussian_logprob(mean, logstd, actions)
        values = self.value(params, obs) if self.with_value_head else None
        return PolicyOutput(actions=actions, logprobs=logprobs, values=values)
