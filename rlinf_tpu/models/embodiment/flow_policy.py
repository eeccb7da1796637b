"""Flow-matching action policy with flow-SDE sampling for RL.

Reference analog: the openpi pi0/pi0.5 flow-matching policies and the
flow-SDE RL recipe (reference rlinf/models/embodiment/openpi +
starvla/action_heads/flowmatching.py; published as piRL, pi_rl.rst:41-89):

  * Imitation/SFT: conditional flow matching — regress the velocity field
    v(x_t, t | obs) toward (x1 - x0) on linear interpolation paths.
  * RL: sample actions by integrating the learned ODE as an SDE; each
    denoising step is a Gaussian "action" in a denoising MDP, so the chain
    has exact per-step logprobs that PPO can importance-weight (the flow-SDE
    construction of piRL).

The velocity network is an MLP over [x_t, t-embedding, obs-encoding];
swap the encoder for a ViT/VLA trunk for image tasks.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init

_LOG_2PI = math.log(2.0 * math.pi)


def _time_embed(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of t in [0,1]; t: [...]."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.linspace(0.0, math.log(1000.0), half)
    )
    ang = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class FlowChain(NamedTuple):
    """The denoising MDP record for RL."""

    actions: jax.Array        # [B, A] final action x1
    chain: jax.Array          # [B, steps+1, A] x_0..x_1
    logprobs: jax.Array       # [B, steps] per-step Gaussian logprob (summed dims)


class FlowMatchingPolicy(Policy):
    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        hidden_sizes: Sequence[int] = (128, 128),
        time_embed_dim: int = 32,
        num_flow_steps: int = 8,
        sde_noise_scale: float = 0.5,
        obs_key: str = "states",
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.hidden_sizes = tuple(hidden_sizes)
        self.time_embed_dim = time_embed_dim
        self.num_flow_steps = num_flow_steps
        self.sde_noise_scale = sde_noise_scale
        self.obs_key = obs_key

    def init(self, rng: jax.Array) -> Dict:
        k1, k2 = jax.random.split(rng)
        in_dim = self.action_dim + self.time_embed_dim + self.obs_dim
        return {
            "velocity": _mlp_init(
                k1, (in_dim, *self.hidden_sizes, self.action_dim), scale_last=0.01
            ),
            "value": _mlp_init(k2, (self.obs_dim, *self.hidden_sizes, 1),
                               scale_last=1.0),
        }

    # ------------------------------------------------------------------
    def velocity(self, params, x_t, t, obs) -> jax.Array:
        """v(x_t, t | obs); x_t [B, A], t [B] in [0,1]."""
        inp = jnp.concatenate(
            [
                x_t.astype(jnp.float32),
                _time_embed(t.astype(jnp.float32), self.time_embed_dim),
                obs[self.obs_key].astype(jnp.float32),
            ],
            axis=-1,
        )
        return _mlp_apply(params["velocity"], inp, activation=jax.nn.relu)

    def value(self, params, obs):
        return _mlp_apply(params["value"], obs[self.obs_key].astype(jnp.float32))[..., 0]

    # -- imitation -------------------------------------------------------
    def flow_matching_loss(self, params, rng, obs, target_actions) -> jax.Array:
        """Conditional flow matching: E_t ||v(x_t,t) - (x1 - x0)||^2."""
        B = target_actions.shape[0]
        k_noise, k_t = jax.random.split(rng)
        x0 = jax.random.normal(k_noise, target_actions.shape, jnp.float32)
        t = jax.random.uniform(k_t, (B,), jnp.float32)
        x1 = target_actions.astype(jnp.float32)
        x_t = (1.0 - t[:, None]) * x0 + t[:, None] * x1
        v = self.velocity(params, x_t, t, obs)
        return jnp.mean(jnp.square(v - (x1 - x0)))

    # -- sampling --------------------------------------------------------
    def sample_ode(self, params, rng, obs, *, steps: Optional[int] = None):
        """Deterministic Euler ODE integration (eval-mode action)."""
        steps = steps or self.num_flow_steps
        B = obs[self.obs_key].shape[0]
        x = jax.random.normal(rng, (B, self.action_dim), jnp.float32)
        dt = 1.0 / steps

        def body(i, x):
            t = jnp.full((B,), i * dt, jnp.float32)
            return x + dt * self.velocity(params, x, t, obs)

        return jax.lax.fori_loop(0, steps, body, x)

    def sample_sde(self, params, rng, obs, *, steps: Optional[int] = None
                   ) -> FlowChain:
        """Flow-SDE: x_{k+1} = x_k + dt*v + sigma*sqrt(dt)*eps — each step is
        a Gaussian with mean x_k + dt*v and std sigma*sqrt(dt), giving exact
        chain logprobs (piRL denoising-MDP construction)."""
        steps = steps or self.num_flow_steps
        B = obs[self.obs_key].shape[0]
        dt = 1.0 / steps
        std = self.sde_noise_scale * math.sqrt(dt)
        k_init, k_steps = jax.random.split(rng)
        x0 = jax.random.normal(k_init, (B, self.action_dim), jnp.float32)

        def body(carry, k):
            x, i = carry
            t = i.astype(jnp.float32) * dt
            mean = x + dt * self.velocity(
                params, x, jnp.full((B,), t, jnp.float32), obs
            )
            eps = jax.random.normal(k, (B, self.action_dim), jnp.float32)
            x_next = mean + std * eps
            lp = jnp.sum(
                -0.5 * jnp.square(eps) - math.log(std) - 0.5 * _LOG_2PI, axis=-1
            )
            return (x_next, i + 1), (x_next, lp)

        keys = jax.random.split(k_steps, steps)
        (x_final, _), (chain, lps) = jax.lax.scan(body, (x0, jnp.zeros((), jnp.int32)), keys)
        chain_full = jnp.concatenate([x0[None], chain], axis=0)  # [S+1, B, A]
        return FlowChain(
            actions=x_final,
            chain=chain_full.swapaxes(0, 1),
            logprobs=lps.T,  # [B, steps]
        )

    def chain_logprobs(self, params, obs, chain: jax.Array) -> jax.Array:
        """Recompute per-step logprobs of a stored chain under CURRENT params
        (the PPO 'new logprob' pass). chain: [B, steps+1, A]."""
        steps = chain.shape[1] - 1
        B = chain.shape[0]
        dt = 1.0 / steps
        std = self.sde_noise_scale * math.sqrt(dt)

        def step_lp(i):
            x_k = chain[:, i, :]
            x_next = chain[:, i + 1, :]
            t = jnp.full((B,), i * dt, jnp.float32)
            mean = x_k + dt * self.velocity(params, x_k, t, obs)
            z = (x_next - mean) / std
            return jnp.sum(
                -0.5 * jnp.square(z) - math.log(std) - 0.5 * _LOG_2PI, axis=-1
            )

        return jnp.stack([step_lp(i) for i in range(steps)], axis=-1)  # [B, S]

    # Policy interface ---------------------------------------------------
    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        """actions here is the stored CHAIN flattened [B, (S+1)*A] — RL over
        the denoising MDP needs the full chain, not just x1."""
        B = actions.shape[0]
        chain = actions.astype(jnp.float32).reshape(
            B, -1, self.action_dim
        )
        lp = self.chain_logprobs(params, obs, chain)
        # entropy of each denoising Gaussian is constant given sigma
        steps = chain.shape[1] - 1
        std = self.sde_noise_scale * math.sqrt(1.0 / steps)
        ent = jnp.full_like(lp, self.action_dim * (math.log(std) + 0.5 * (_LOG_2PI + 1)))
        return {
            "logprobs": lp,
            "entropy": ent,
            "values": self.value(params, obs),
        }

    def predict_action_batch(
        self, params, rng, obs, *, deterministic: bool = False
    ) -> PolicyOutput:
        if deterministic:
            actions = self.sample_ode(params, rng, obs)
            B = actions.shape[0]
            return PolicyOutput(
                actions=actions,
                logprobs=jnp.zeros((B, 1), jnp.float32),
                values=self.value(params, obs),
            )
        out = self.sample_sde(params, rng, obs)
        B = out.actions.shape[0]
        return PolicyOutput(
            # env consumes x1; the chain rides along flattened for training
            actions=out.chain.reshape(B, -1),
            logprobs=out.logprobs,
            values=self.value(params, obs),
        )

    def env_actions(self, policy_actions: jax.Array) -> jax.Array:
        """Extract x1 (the env-facing action) from the flattened chain."""
        B = policy_actions.shape[0]
        chain = policy_actions.reshape(B, -1, self.action_dim)
        return chain[:, -1, :]
