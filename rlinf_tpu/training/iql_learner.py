"""Implicit Q-Learning (IQL): offline RL without bootstrapped OOD actions.

Reference analog: rlinf/workers/actor/fsdp_iql_policy_worker.py (997 LoC) and
the iql_forward hooks of BasePolicy. One jitted step runs the three IQL
updates: expectile value regression V <- L2^tau(Q - V), TD Q-learning against
V, and advantage-weighted actor regression (AWR) with exp(beta * A) weights.

Works on MLPSACPolicy params (reuses its actor + twin Qs) plus an extra V
network initialized here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.training.train_state import TrainState
from rlinf_tpu.training.learner import optax_global_norm


@dataclasses.dataclass(frozen=True)
class IQLConfig:
    gamma: float = 0.99
    tau: float = 0.005             # polyak for target Q
    expectile: float = 0.7         # tau in the expectile loss
    beta: float = 3.0              # AWR inverse temperature
    adv_clip: float = 100.0        # exp-weight clip


def init_iql_extras(policy: MLPSACPolicy, rng: jax.Array) -> Dict:
    """V-network params to merge into the policy's param dict."""
    return {
        "v_net": _mlp_init(
            rng, (policy.obs_dim, *policy.hidden_sizes, 1), scale_last=1.0
        )
    }


def expectile_loss(diff: jax.Array, expectile: float) -> jax.Array:
    weight = jnp.where(diff > 0, expectile, 1.0 - expectile)
    return weight * jnp.square(diff)


def make_iql_train_step(
    policy: MLPSACPolicy,
    cfg: IQLConfig,
    tx: optax.GradientTransformation,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """Batch: obs/<k>, actions, rewards, next_obs/<k>, dones (all [N, ...])."""

    def split_obs(batch, prefix):
        return {k[len(prefix):]: v for k, v in batch.items() if k.startswith(prefix)}

    def v_of(params, obs):
        return _mlp_apply(
            params["v_net"], obs[policy.obs_key].astype(jnp.float32),
            activation=jax.nn.relu,
        )[..., 0]

    def loss_fn(params, frozen, batch):
        obs = split_obs(batch, "obs/")
        next_obs = split_obs(batch, "next_obs/")
        actions = batch["actions"]

        # 1. V update: expectile regression toward frozen target-Q(s, a_data)
        tq1, tq2 = policy.q_values(frozen, obs, actions, target=True)
        target_q = jax.lax.stop_gradient(jnp.minimum(tq1, tq2))
        v = v_of(params, obs)
        v_loss = jnp.mean(expectile_loss(target_q - v, cfg.expectile))

        # 2. Q update: TD target r + gamma * (1-d) * V(s') with frozen V
        next_v = jax.lax.stop_gradient(v_of(frozen, next_obs))
        td_target = batch["rewards"] + cfg.gamma * (1.0 - batch["dones"]) * next_v
        q1, q2 = policy.q_values(params, obs, actions)
        q_loss = jnp.mean(jnp.square(q1 - td_target)) + jnp.mean(
            jnp.square(q2 - td_target)
        )

        # 3. AWR actor: exp(beta * A) weighted logprob of dataset actions
        adv = jax.lax.stop_gradient(target_q - v_of(frozen, obs))
        weights = jnp.minimum(jnp.exp(cfg.beta * adv), cfg.adv_clip)
        fwd = policy.default_forward(params, obs, actions)
        actor_loss = -jnp.mean(
            weights * jnp.sum(fwd["logprobs"], axis=-1)
        )

        loss = v_loss + q_loss + actor_loss
        metrics = {
            "iql/v_loss": jax.lax.stop_gradient(v_loss),
            "iql/q_loss": jax.lax.stop_gradient(q_loss),
            "iql/actor_loss": jax.lax.stop_gradient(actor_loss),
            "iql/adv_mean": jnp.mean(adv),
            "iql/awr_weight_mean": jnp.mean(weights),
        }
        return loss, metrics

    def train_step(state: TrainState, batch):
        frozen = jax.lax.stop_gradient(state.params)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        for name in ("q1", "q2"):
            new_params[f"{name}_target"] = jax.tree_util.tree_map(
                lambda t, o: (1.0 - cfg.tau) * t + cfg.tau * o,
                state.params[f"{name}_target"],
                new_params[name],
            )
        metrics = dict(metrics)
        metrics["iql/loss"] = loss
        metrics["iql/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
