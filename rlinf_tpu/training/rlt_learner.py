"""RLT actor-critic learner (teacher-guided SAC-style update).

Reference analog: rlinf/workers/actor/fsdp_rlt_ac_policy_worker.py
(RLTACLossMixin forward_critic/forward_actor, 920 LoC):

  * Critic: twin Q on executed (possibly expert-routed) transitions; target =
    discounted chunk-reward + gamma^H * not_done * minQ(s', pi(s')) from the
    polyak target critics (bootstrap_type "standard"/"always").
  * Actor: deterministic pi(s); loss = -q_weight * Q1(s, pi) + bc_weight *
    MSE(pi, bc_target) where bc_target = executed action on intervened rows
    (expert/human) and the reference chunk elsewhere (_bc_metrics).
  * No entropy/alpha training (forward_alpha raises in the reference).
  * bc_weight/q_weight follow a warmup→ramp schedule
    (_actor_objective_weights → algorithms.rlt.ActorWeightSchedule here).

One donated jitted step over the existing MLPSACPolicy param layout (twin Q +
targets); the deterministic actor action is the tanh-squashed mean.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rlinf_tpu.algorithms.rlt import ActorWeightSchedule, discounted_chunk_rewards
from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
from rlinf_tpu.training.learner import optax_global_norm
from rlinf_tpu.training.train_state import TrainState


@dataclasses.dataclass(frozen=True)
class RLTACConfig:
    gamma: float = 0.99
    tau: float = 0.005                   # polyak rate for target critics
    bootstrap_type: str = "standard"     # "standard" | "always"
    weights: ActorWeightSchedule = ActorWeightSchedule()


def make_rlt_train_step(
    policy: MLPSACPolicy,
    cfg: RLTACConfig,
    tx: optax.GradientTransformation,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array, jax.Array,
               jax.Array], Tuple[TrainState, Dict]]:
    """Batch keys: obs/<k> [B,obs], next_obs/<k>, actions [B,A] (executed,
    flattened chunk), ref_chunk [B,A], intervene_flags [B] (bool), rewards
    [B] or [B,chunk], dones [B]. Extra args: rng, bc_weight, q_weight (from
    cfg.weights.at(update_step), host-side so the schedule never recompiles).
    """

    def split_obs(batch, prefix):
        return {k[len(prefix):]: v for k, v in batch.items()
                if k.startswith(prefix)}

    def loss_fn(params, target_params, batch, rng, bc_w, q_w):
        obs = split_obs(batch, "obs/")
        next_obs = split_obs(batch, "next_obs/")
        actions = batch["actions"].astype(jnp.float32)

        # --- critic -------------------------------------------------------
        next_a, _ = policy.sample_action(params, rng, next_obs,
                                         deterministic=True)
        next_a = jax.lax.stop_gradient(next_a)
        tq1, tq2 = policy.q_values(
            {**params, "q1_target": target_params["q1_target"],
             "q2_target": target_params["q2_target"]},
            next_obs, next_a, target=True)
        q_next = jnp.minimum(tq1, tq2)[:, None]
        reward_target = discounted_chunk_rewards(batch["rewards"], cfg.gamma)
        horizon = (batch["rewards"].shape[-1]
                   if batch["rewards"].ndim > 1 else 1)
        bootstrap_disc = cfg.gamma ** horizon
        not_done = (1.0 - batch["dones"].reshape(-1, 1).astype(jnp.float32))
        if cfg.bootstrap_type == "always":
            target_q = reward_target + bootstrap_disc * q_next
        else:
            target_q = reward_target + not_done * bootstrap_disc * q_next
        target_q = jax.lax.stop_gradient(target_q[:, 0])
        q1, q2 = policy.q_values(params, obs, actions)
        critic_loss = (jnp.mean(jnp.square(q1 - target_q))
                       + jnp.mean(jnp.square(q2 - target_q)))

        # --- actor --------------------------------------------------------
        pi, _ = policy.sample_action(params, rng, obs, deterministic=True)
        q_params = jax.lax.stop_gradient(
            {"q1": params["q1"], "q2": params["q2"]})
        aq1, _ = policy.q_values({**params, **q_params}, obs, pi)

        ref_chunk = batch["ref_chunk"].astype(jnp.float32)[:, :pi.shape[-1]]
        human = batch["intervene_flags"].astype(bool)[:, None]
        bc_target = jnp.where(human, actions, ref_chunk)
        bc_err = jnp.mean(jnp.square(pi - bc_target), axis=-1)
        bc_loss = jnp.mean(bc_err)

        policy_mask = (~human[:, 0]).astype(jnp.float32)
        human_mask = human[:, 0].astype(jnp.float32)
        ref_err = jnp.mean(jnp.square(pi - ref_chunk), axis=-1)
        human_err = jnp.mean(jnp.square(pi - actions), axis=-1)
        bc_ref = jnp.sum(ref_err * policy_mask) / jnp.maximum(
            jnp.sum(policy_mask), 1.0)
        bc_human = jnp.sum(human_err * human_mask) / jnp.maximum(
            jnp.sum(human_mask), 1.0)

        actor_loss = -q_w * jnp.mean(aq1) + bc_w * bc_loss
        loss = critic_loss + actor_loss
        metrics = {
            "rlt/critic_loss": critic_loss,
            "rlt/actor_loss": actor_loss,
            "rlt/bc_loss": bc_loss,
            "rlt/bc_ref_loss": bc_ref,
            "rlt/bc_human_loss": bc_human,
            "rlt/human_mask_ratio": jnp.mean(human_mask),
            "rlt/q_pi": jnp.mean(aq1),
            "rlt/q_data": jnp.mean(q1),
            "rlt/weighted_q": q_w * jnp.mean(aq1),
            "rlt/weighted_bc": bc_w * bc_loss,
        }
        return loss, jax.lax.stop_gradient(metrics)

    def train_step(state: TrainState, batch, rng, bc_w, q_w):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.params, batch, rng, bc_w, q_w)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        for name in ("q1", "q2"):
            new_params[f"{name}_target"] = jax.tree_util.tree_map(
                lambda t, o: (1.0 - cfg.tau) * t + cfg.tau * o,
                state.params[f"{name}_target"], new_params[name])
        metrics = dict(metrics)
        metrics["rlt/loss"] = loss
        metrics["rlt/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
