"""Squashed-Gaussian SAC policy with twin Q heads.

Reference analog: the SAC path of rlinf/models/embodiment (sac_forward /
sac_q_forward hooks, base_policy.py:57-63) driven by
rlinf/workers/actor/fsdp_sac_policy_worker.py. Tanh-squashed Gaussian actor
with log-prob correction, twin Q(s,a) critics, and a separable target-critic
param subtree for polyak averaging.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init

_LOG_2PI = math.log(2.0 * math.pi)
LOGSTD_MIN, LOGSTD_MAX = -5.0, 2.0


class MLPSACPolicy(Policy):
    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        hidden_sizes: Sequence[int] = (256, 256),
        obs_key: str = "states",
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.hidden_sizes = tuple(hidden_sizes)
        self.obs_key = obs_key

    def init(self, rng: jax.Array):
        ka, k1, k2 = jax.random.split(rng, 3)
        actor_sizes = (self.obs_dim, *self.hidden_sizes, 2 * self.action_dim)
        q_sizes = (self.obs_dim + self.action_dim, *self.hidden_sizes, 1)
        q1 = _mlp_init(k1, q_sizes, scale_last=1.0)
        q2 = _mlp_init(k2, q_sizes, scale_last=1.0)
        return {
            "actor": _mlp_init(ka, actor_sizes, scale_last=0.01),
            "q1": q1,
            "q2": q2,
            # targets start as copies (polyak-averaged thereafter)
            "q1_target": jax.tree_util.tree_map(jnp.copy, q1),
            "q2_target": jax.tree_util.tree_map(jnp.copy, q2),
            "log_alpha": jnp.zeros((), jnp.float32),
        }

    # ------------------------------------------------------------------
    def _dist(self, params, obs):
        x = obs[self.obs_key].astype(jnp.float32)
        out = _mlp_apply(params["actor"], x, activation=jax.nn.relu)
        mean, logstd = jnp.split(out, 2, axis=-1)
        logstd = jnp.clip(logstd, LOGSTD_MIN, LOGSTD_MAX)
        return mean, logstd

    def sample_action(self, params, rng, obs, *, deterministic=False):
        """-> (tanh-squashed action in [-1,1], per-dim corrected logprob)."""
        mean, logstd = self._dist(params, obs)
        if deterministic:
            pre = mean
        else:
            pre = mean + jnp.exp(logstd) * jax.random.normal(
                rng, mean.shape, jnp.float32
            )
        action = jnp.tanh(pre)
        z = (pre - mean) / jnp.exp(logstd)
        logprob = -0.5 * jnp.square(z) - logstd - 0.5 * _LOG_2PI
        # tanh change-of-variables: log(1 - tanh^2) computed stably
        logprob = logprob - 2.0 * (
            math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)
        )
        return action, logprob

    def q_values(self, params, obs, actions, *, target=False) -> Tuple[jax.Array, jax.Array]:
        x = jnp.concatenate(
            [obs[self.obs_key].astype(jnp.float32), actions.astype(jnp.float32)],
            axis=-1,
        )
        k1 = "q1_target" if target else "q1"
        k2 = "q2_target" if target else "q2"
        q1 = _mlp_apply(params[k1], x, activation=jax.nn.relu)[..., 0]
        q2 = _mlp_apply(params[k2], x, activation=jax.nn.relu)[..., 0]
        return q1, q2

    # Policy interface ---------------------------------------------------
    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        mean, logstd = self._dist(params, obs)
        # logprob of given (squashed) actions: invert tanh
        a = jnp.clip(actions.astype(jnp.float32), -1 + 1e-6, 1 - 1e-6)
        pre = jnp.arctanh(a)
        z = (pre - mean) / jnp.exp(logstd)
        logprob = -0.5 * jnp.square(z) - logstd - 0.5 * _LOG_2PI
        logprob = logprob - 2.0 * (
            math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)
        )
        entropy = logstd + 0.5 * (_LOG_2PI + 1.0)
        return {"logprobs": logprob, "entropy": entropy}

    def predict_action_batch(
        self, params, rng, obs, *, deterministic: bool = False
    ) -> PolicyOutput:
        action, logprob = self.sample_action(
            params, rng, obs, deterministic=deterministic
        )
        return PolicyOutput(actions=action, logprobs=logprob, values=None)
