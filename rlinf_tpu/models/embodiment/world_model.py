"""Learned dynamics (world) model: (state, action) → (next state, reward, done).

Reference analog: the world-model env family (reference
rlinf/envs/world_model/{base_world_env,world_model_opensora_env}.py) uses a
learned generative model as the simulator — there a video diffusion model
stepping frames from actions, with rewards from a reward model. The TPU
re-design keeps the same architecture seam (a learned, batched, jitted step
function behind the VectorEnv contract — envs/world_model.py) with a compact
state-space dynamics model; swap this MLP for a latent video model without
touching the env or the RL loop.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init
from rlinf_tpu.training.learner import optax_global_norm
from rlinf_tpu.training.train_state import TrainState


class MLPWorldModel:
    """Residual dynamics: s' = s + f(s, a); heads for reward and done."""

    def __init__(self, obs_dim: int, action_dim: int,
                 hidden_sizes=(128, 128)):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.hidden_sizes = tuple(hidden_sizes)

    def init(self, rng: jax.Array) -> Dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        in_dim = self.obs_dim + self.action_dim
        return {
            "dynamics": _mlp_init(
                k1, (in_dim, *self.hidden_sizes, self.obs_dim),
                scale_last=0.01),
            "reward": _mlp_init(
                k2, (in_dim, *self.hidden_sizes, 1), scale_last=1.0),
            "done": _mlp_init(
                k3, (in_dim, *self.hidden_sizes, 1), scale_last=1.0),
        }

    def step(self, params, states: jax.Array, actions: jax.Array
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """→ (next_states [B,S], rewards [B], done_probs [B])."""
        x = jnp.concatenate(
            [states.astype(jnp.float32), actions.astype(jnp.float32)],
            axis=-1)
        delta = _mlp_apply(params["dynamics"], x, activation=jax.nn.relu)
        reward = _mlp_apply(params["reward"], x, activation=jax.nn.relu)[..., 0]
        done_p = jax.nn.sigmoid(
            _mlp_apply(params["done"], x, activation=jax.nn.relu)[..., 0])
        return states + delta, reward, done_p


@dataclasses.dataclass(frozen=True)
class WorldModelTrainConfig:
    reward_coef: float = 1.0
    done_coef: float = 1.0


def make_world_model_train_step(
    model: MLPWorldModel,
    cfg: WorldModelTrainConfig,
    tx: optax.GradientTransformation,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """Supervised fit on transitions {obs/states, actions, next_obs/states,
    rewards, dones} (the world-model SFT analog, reference
    data/datasets world-model SFT loaders)."""

    def loss_fn(params, batch):
        pred_next, pred_r, pred_done = model.step(
            params, batch["obs/states"], batch["actions"])
        dyn_loss = jnp.mean(jnp.square(
            pred_next - batch["next_obs/states"].astype(jnp.float32)))
        r_loss = jnp.mean(jnp.square(
            pred_r - batch["rewards"].astype(jnp.float32)))
        dones = batch["dones"].astype(jnp.float32)
        eps = 1e-6
        done_loss = -jnp.mean(
            dones * jnp.log(pred_done + eps)
            + (1.0 - dones) * jnp.log(1.0 - pred_done + eps))
        loss = dyn_loss + cfg.reward_coef * r_loss + cfg.done_coef * done_loss
        return loss, {
            "world_model/dynamics_mse": dyn_loss,
            "world_model/reward_mse": r_loss,
            "world_model/done_bce": done_loss,
        }

    def step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["world_model/loss"] = loss
        metrics["world_model/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(step, donate_argnums=(0,))
