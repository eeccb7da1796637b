"""Jitted SAC update (twin-Q + squashed-Gaussian actor + auto temperature).

Reference analog: rlinf/workers/actor/fsdp_sac_policy_worker.py (847 LoC of
torch SAC) collapsed to one donated-buffer jitted step: critic TD update
against polyak targets, actor update through min-Q, optional learned alpha
against a target entropy.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.training.train_state import TrainState
from rlinf_tpu.training.learner import optax_global_norm


@dataclasses.dataclass(frozen=True)
class SACConfig:
    gamma: float = 0.99
    tau: float = 0.005                  # polyak rate
    learn_alpha: bool = True
    init_alpha: float = 0.2
    target_entropy: float = 0.0         # 0 => -action_dim


def make_sac_train_step(
    policy: MLPSACPolicy,
    cfg: SACConfig,
    tx: optax.GradientTransformation,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Dict]]:
    """Batch: obs/<key> [N, obs], actions [N, A] (squashed), rewards [N],
    next_obs/<key> [N, obs], dones [N]."""
    target_entropy = (
        cfg.target_entropy if cfg.target_entropy != 0.0 else -float(policy.action_dim)
    )

    def split_obs(batch, prefix):
        return {
            k[len(prefix):]: v for k, v in batch.items() if k.startswith(prefix)
        }

    def loss_fn(params, target_params, batch, rng):
        obs = split_obs(batch, "obs/")
        next_obs = split_obs(batch, "next_obs/")
        alpha = (
            jnp.exp(params["log_alpha"]) if cfg.learn_alpha else cfg.init_alpha
        )

        # --- critic loss -------------------------------------------------
        rng, k_next = jax.random.split(rng)
        next_a, next_lp = policy.sample_action(params, k_next, next_obs)
        next_lp_sum = jnp.sum(next_lp, axis=-1)
        tq1, tq2 = policy.q_values(
            {**params, "q1_target": target_params["q1_target"],
             "q2_target": target_params["q2_target"]},
            next_obs, next_a, target=True,
        )
        target_v = jnp.minimum(tq1, tq2) - jax.lax.stop_gradient(alpha) * next_lp_sum
        target_q = jax.lax.stop_gradient(
            batch["rewards"]
            + cfg.gamma * (1.0 - batch["dones"]) * target_v
        )
        q1, q2 = policy.q_values(params, obs, batch["actions"])
        critic_loss = jnp.mean(jnp.square(q1 - target_q)) + jnp.mean(
            jnp.square(q2 - target_q)
        )

        # --- actor loss --------------------------------------------------
        rng, k_act = jax.random.split(rng)
        new_a, new_lp = policy.sample_action(params, k_act, obs)
        new_lp_sum = jnp.sum(new_lp, axis=-1)
        # actor gradient must not flow into critics
        q_params = jax.lax.stop_gradient({"q1": params["q1"], "q2": params["q2"]})
        aq1, aq2 = policy.q_values({**params, **q_params}, obs, new_a)
        actor_loss = jnp.mean(
            jax.lax.stop_gradient(alpha) * new_lp_sum - jnp.minimum(aq1, aq2)
        )

        # --- temperature -------------------------------------------------
        if cfg.learn_alpha:
            alpha_loss = -jnp.mean(
                params["log_alpha"]
                * jax.lax.stop_gradient(new_lp_sum + target_entropy)
            )
        else:
            alpha_loss = jnp.zeros(())

        loss = critic_loss + actor_loss + alpha_loss
        metrics = {
            "sac/critic_loss": jax.lax.stop_gradient(critic_loss),
            "sac/actor_loss": jax.lax.stop_gradient(actor_loss),
            "sac/alpha_loss": jax.lax.stop_gradient(alpha_loss),
            "sac/alpha": jax.lax.stop_gradient(
                alpha if cfg.learn_alpha else jnp.asarray(alpha)
            ),
            "sac/q1_mean": jax.lax.stop_gradient(jnp.mean(q1)),
            "sac/entropy": jax.lax.stop_gradient(-jnp.mean(new_lp_sum)),
        }
        return loss, metrics

    def train_step(state: TrainState, batch, rng):
        # Split live vs target params: targets are not optimized.
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.params, batch, rng
        )
        # zero grads on targets (value_and_grad produced them as zeros anyway
        # since loss_fn reads targets from arg 2)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # polyak target update
        for name in ("q1", "q2"):
            new_params[f"{name}_target"] = jax.tree_util.tree_map(
                lambda t, o: (1.0 - cfg.tau) * t + cfg.tau * o,
                state.params[f"{name}_target"],
                new_params[name],
            )
        metrics = dict(metrics)
        metrics["sac/loss"] = loss
        metrics["sac/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
