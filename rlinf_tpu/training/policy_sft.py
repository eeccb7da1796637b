"""SFT / behavior cloning over embodied policies (VLA/VLM/flow).

Reference analog: the workers/sft family (fsdp_sft_worker for VLA/VLM
variants, openpi/dreamzero/dagger SFT datasets, SURVEY.md §2.3 "SFT
workers"). One jitted step covers the three BC loss types the reference's
per-model SFT workers implement:

  * ``flow``: conditional flow matching (pi0/gr00t/starvla families) via the
    policy's ``flow_matching_loss``.
  * ``nll``:  -E[logprob(target | obs)] via ``default_forward`` (discrete
    action-bin OpenVLA CE; Gaussian policies' NLL).
  * ``l1``:   |mean_action - target| on the deterministic head (the OFT
    recipe's regression loss).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy
from rlinf_tpu.training.learner import optax_global_norm
from rlinf_tpu.training.train_state import TrainState


def infer_sft_loss_type(policy: Policy) -> str:
    if hasattr(policy, "flow_matching_loss"):
        return "flow"
    return "nll"


def make_policy_sft_train_step(
    policy: Policy,
    tx,
    *,
    loss_type: str = "auto",
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Batch: {"obs": {key: [B, ...]}, "actions": [B, ...]} (+ per-step rng
    for flow-matching time/noise sampling)."""
    if loss_type == "auto":
        loss_type = infer_sft_loss_type(policy)

    def loss_fn(params, batch, rng):
        obs, target = batch["obs"], batch["actions"]
        if loss_type == "flow":
            loss = policy.flow_matching_loss(params, rng, obs, target)
            return loss, {}
        if loss_type == "nll":
            out = policy.default_forward(params, obs, target)
            loss = -jnp.mean(out["logprobs"])
            return loss, {"sft/entropy": jnp.mean(out["entropy"])}
        if loss_type == "l1":
            pred = policy.predict_action_batch(
                params, rng, obs, deterministic=True
            ).actions
            loss = jnp.mean(jnp.abs(pred - target.reshape(pred.shape)))
            return loss, {}
        raise ValueError(f"unknown loss_type {loss_type!r}")

    def train_step(state: TrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)
                          ).astype(p.dtype),
            state.params, updates,
        )
        metrics = {
            "sft/loss": loss,
            "sft/grad_norm": optax_global_norm(grads),
            **aux,
        }
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,))
