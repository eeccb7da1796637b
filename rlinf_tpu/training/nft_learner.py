"""NFT (negative-aware fine-tuning) learner for flow-matching policies.

Reference analog: rlinf/workers/actor/fsdp_nft_policy_worker.py (622 LoC torch
worker) — DiffusionNFT-style RL for flow policies without logprobs:

  * Each update resamples a flow timestep t and a noisy interpolation point
    x_t between noise and the executed action x1, then evaluates the lagged
    rollout model's velocity v_old and the training model's v_theta at x_t
    (`_precompute_nft_training_inputs`, `_recompute_v_old`).
  * delta_v = v_theta - v_old is norm-clipped (`_compute_clipped_delta_v`,
    max_drift) and turned into positive/negative candidate velocities
    v± = v_old ± beta * clip(delta_v).
  * Each candidate predicts the clean action; weighted squared errors to the
    executed action give energies e±; the loss pushes e+ down on
    positive-advantage samples and e- down on negatives — either a DPO-style
    softplus on (e+ - e-) or a direct MSE mix (`_compute_nft_loss`).
  * The rollout model is soft-updated toward the training model with a
    (possibly annealed) rate tau (`soft_update_rollout_model`).

TPU design: the whole update is ONE jitted donated-buffer step over a
NFTTrainState carrying (params, opt_state, rollout_params); v_old recompute
needs no second model instance — it is the same pure velocity function
applied to the lagged param pytree. Timestep convention here is t=0 noise →
t=1 clean (the reference uses the reversed schedule; math is identical under
s = 1 - t).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from rlinf_tpu.models.embodiment.flow_policy import FlowMatchingPolicy
from rlinf_tpu.training.learner import optax_global_norm


@dataclasses.dataclass(frozen=True)
class NFTConfig:
    num_steps: int = 8            # flow discretization for timestep resampling
    beta: float = 1.0             # candidate scale (reference nft_beta)
    max_drift: float = 0.5        # delta_v norm clip (reference max_drift)
    loss_form: str = "dpo"        # "dpo" | "mse" (reference nft_loss_form)
    dpo_beta: float = 1.0
    weight_mode: str = "adaptive"  # "constant" | "adaptive" (reference auto/ODE)
    # scalar, or (pos_scale, neg_scale) like the reference's nft_weight_scale
    # list — downweighting negatives stabilizes low-success-rate batches
    weight_scale: Tuple[float, ...] = (1.0,)
    adv_type: str = "raw"         # "raw": advantages already in [0,1]
    adv_clip_max: float = 1.0     # for non-raw: clip then rescale to [0,1]
    # tau: rollout-model soft-update rate. Scalar, or (start, end, s0, s1)
    # for linear annealing over training steps (reference _get_current_nft_tau).
    tau: Tuple[float, ...] = (1.0,)


class NFTTrainState(NamedTuple):
    step: jax.Array
    params: Dict
    opt_state: optax.OptState
    rollout_params: Dict          # lagged model for v_old (tau<1 off-policy)


def nft_tau_at(cfg: NFTConfig, step: int) -> float:
    """Scalar tau or linear anneal (start, end, s0, s1) — host-side."""
    if len(cfg.tau) == 1:
        return float(cfg.tau[0])
    start_tau, end_tau, s0, s1 = cfg.tau
    if step <= s0:
        return float(start_tau)
    if step >= s1:
        return float(end_tau)
    ratio = (step - s0) / float(s1 - s0)
    return float(start_tau + (end_tau - start_tau) * ratio)


def _postprocess_advantages(cfg: NFTConfig, adv: jax.Array) -> jax.Array:
    """Map advantages into [0,1] (reference _postprocess_advantages)."""
    if cfg.adv_type == "raw":
        return adv
    a = jnp.clip(adv, -cfg.adv_clip_max, cfg.adv_clip_max)
    return (a + cfg.adv_clip_max) / (2.0 * cfg.adv_clip_max)


def make_nft_train_step(
    policy: FlowMatchingPolicy,
    cfg: NFTConfig,
    tx: optax.GradientTransformation,
) -> Callable[[NFTTrainState, Dict[str, jax.Array], jax.Array, jax.Array],
              Tuple[NFTTrainState, Dict]]:
    """Batch: obs/<key> [B, obs], actions [B, A] (executed clean actions),
    advantages [B] (NFT reward/advantage), loss_mask [B]. The rollout (v_old)
    model in the state is NOT updated here — call ``soft_update_rollout``
    once per training round with ``nft_tau_at(cfg, round)``."""

    def split_obs(batch):
        return {k[len("obs/"):]: v for k, v in batch.items()
                if k.startswith("obs/")}

    def loss_fn(params, rollout_params, batch, rng):
        obs = split_obs(batch)
        x1 = batch["actions"].astype(jnp.float32)
        B = x1.shape[0]
        adv = _postprocess_advantages(
            cfg, batch["advantages"].astype(jnp.float32))
        mask = batch["loss_mask"].astype(jnp.float32)

        # Resample timesteps + interpolation points (xcur_source="resample").
        k_step, k_noise = jax.random.split(rng)
        step_idx = jax.random.randint(k_step, (B,), 0, cfg.num_steps)
        t = step_idx.astype(jnp.float32) / cfg.num_steps   # in [0, 1)
        eps = jax.random.normal(k_noise, x1.shape, jnp.float32)
        x_t = (1.0 - t[:, None]) * eps + t[:, None] * x1

        # Old velocity under the lagged rollout model (recompute_v path).
        v_old = jax.lax.stop_gradient(
            policy.velocity(rollout_params, x_t, t, obs))
        v_theta = policy.velocity(params, x_t, t, obs)

        # Norm-clipped drift and pos/neg candidates.
        delta_v = v_theta - v_old
        # smoothed norm: grad is 0 (not NaN) at delta_v == 0, which is the
        # every-step state under tau=1 on-policy sync
        delta_norm = jnp.sqrt(
            jnp.sum(jnp.square(delta_v), axis=-1, keepdims=True) + 1e-12)
        clip_coef = jnp.minimum(cfg.max_drift / delta_norm, 1.0)
        dv = delta_v * clip_coef
        v_pos = v_old + cfg.beta * dv
        v_neg = v_old - cfg.beta * dv

        # Clean-action prediction from each candidate (x1 target space):
        # x1_pred = x_t + v * (1 - t).
        rem = (1.0 - t)[:, None]
        pred_pos = x_t + v_pos * rem
        pred_neg = x_t + v_neg * rem
        target = x1

        pos_scale = float(cfg.weight_scale[0])
        neg_scale = float(cfg.weight_scale[-1])

        def energy(pred, scale):
            err = jnp.square(pred - target)
            if cfg.weight_mode == "adaptive":
                # DiffusionNFT adaptive weight: 1 / mean-abs-error (stop-grad)
                w = jax.lax.stop_gradient(
                    jnp.clip(jnp.mean(jnp.abs(pred - target), axis=-1,
                                      keepdims=True), 1e-4))
                err = err / w
            return scale * jnp.sum(err, axis=-1)

        e_pos = energy(pred_pos, pos_scale)
        e_neg = energy(pred_neg, neg_scale)
        delta_e = e_pos - e_neg

        denom = jnp.maximum(jnp.sum(mask), 1.0)
        if cfg.loss_form == "dpo":
            y = adv * 2.0 - 1.0
            logit = (cfg.dpo_beta / 2.0) * y * delta_e
            loss = jnp.sum(jax.nn.softplus(logit) * mask) / denom
        elif cfg.loss_form == "mse":
            loss = jnp.sum((adv * e_pos + (1.0 - adv) * e_neg) * mask) / denom
        else:
            raise ValueError(f"Unsupported nft loss_form: {cfg.loss_form}")

        pos_mask = mask * (adv > 0.5)
        neg_mask = mask * (adv < 0.5)
        metrics = {
            "nft/loss": loss,
            "nft/delta_v_norm": jnp.mean(delta_norm[..., 0]),
            "nft/clip_frac": jnp.mean((clip_coef < 1.0).astype(jnp.float32)),
            "nft/e_pos_mean": jnp.sum(e_pos * mask) / denom,
            "nft/e_neg_mean": jnp.sum(e_neg * mask) / denom,
            "nft/e_pos_mean_pos_only":
                jnp.sum(e_pos * pos_mask) / jnp.maximum(jnp.sum(pos_mask), 1.0),
            "nft/e_neg_mean_neg_only":
                jnp.sum(e_neg * neg_mask) / jnp.maximum(jnp.sum(neg_mask), 1.0),
            "nft/delta_e_mean": jnp.sum(delta_e * mask) / denom,
        }
        return loss, jax.lax.stop_gradient(metrics)

    def train_step(state: NFTTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.rollout_params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["nft/grad_norm"] = optax_global_norm(grads)
        return (
            NFTTrainState(state.step + 1, new_params, new_opt,
                          state.rollout_params),
            metrics,
        )

    return jax.jit(train_step, donate_argnums=(0,))


@jax.jit
def soft_update_rollout(state: NFTTrainState, tau) -> NFTTrainState:
    """Sync the rollout (v_old) model toward params with rate tau — call ONCE
    per training round, before the gradient-step epoch (reference
    soft_update_rollout_model + the v_old precompute in
    _precompute_nft_training_inputs). Syncing every gradient step would keep
    delta_v == 0 at evaluation, so the DPO logit never saturates and negative
    samples push the velocity field without bound."""
    new_rollout = jax.tree_util.tree_map(
        lambda p, r: tau * p + (1.0 - tau) * r,
        state.params, state.rollout_params)
    return state._replace(rollout_params=new_rollout)


def init_nft_state(
    policy: FlowMatchingPolicy,
    rng: jax.Array,
    tx: optax.GradientTransformation,
) -> NFTTrainState:
    params = policy.init(rng)
    return NFTTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rollout_params=jax.tree_util.tree_map(jnp.copy, params),
    )
