"""RLT (RL-from-Teacher) routing and transition utilities.

Reference analog: rlinf/algorithms/rlt/{route,transition,expert,rollout}.py —
a student policy rolls out alongside a *reference* action chunk (e.g. the
base VLA's plan) and an optional *expert* (teacher model or human
intervention). Per env, per chunk-step, a switch flag routes which action the
env actually executes; executed-but-not-student actions are recorded as
intervention transitions so the actor can BC toward them while the critic
learns Q off the executed stream (route.py RLTRouteContext/RLTRoute,
fsdp_rlt_ac_policy_worker.py _bc_metrics).

TPU design: routing is a pure `jnp.where` over batched action tensors (no
per-env Python branching), so the route sits inside the jitted rollout step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

# Observation keys the RLT obs contract carries alongside raw env obs
# (reference transition.py RLT_OBS_KEYS: latent z, proprio, reference chunk).
RLT_OBS_KEYS = ("z_rl", "proprio", "ref_chunk")


class RLTRouteOutput(NamedTuple):
    actions: jax.Array           # [B, chunk, A] what the env executes
    intervene_flags: jax.Array   # [B, chunk] bool: executed != student
    source: jax.Array            # [B] int8: 0=student 1=reference 2=expert


def route_actions(
    student_actions: jax.Array,          # [B, chunk, A]
    ref_chunk: Optional[jax.Array] = None,       # [B, chunk, A] or None
    expert_actions: Optional[jax.Array] = None,  # [B, chunk, A] or None
    *,
    switch_to_ref: Optional[jax.Array] = None,   # [B] bool
    intervene_requested: Optional[jax.Array] = None,  # [B] bool (expert wins)
) -> RLTRouteOutput:
    """Select executed actions per env (reference route.py route()).

    Priority: expert intervention > reference switch > student. All-tensor
    select so it lives inside jit; flags mark non-student rows for the BC
    target construction in the RLT-AC actor loss.
    """
    B, chunk = student_actions.shape[:2]
    actions = student_actions
    source = jnp.zeros((B,), jnp.int8)
    if ref_chunk is not None and switch_to_ref is not None:
        ref = ref_chunk[:, :chunk, : student_actions.shape[-1]]
        sw = switch_to_ref.astype(bool)
        actions = jnp.where(sw[:, None, None], ref, actions)
        source = jnp.where(sw, jnp.int8(1), source)
    if expert_actions is not None and intervene_requested is not None:
        iv = intervene_requested.astype(bool)
        actions = jnp.where(iv[:, None, None], expert_actions, actions)
        source = jnp.where(iv, jnp.int8(2), source)
    intervene_flags = jnp.broadcast_to((source > 0)[:, None], (B, chunk))
    return RLTRouteOutput(actions=actions, intervene_flags=intervene_flags,
                          source=source)


def predict_expert_actions(
    expert_policy, expert_params, rng, obs: Dict[str, jax.Array], *,
    chunk_len: int, action_dim: int,
) -> jax.Array:
    """Teacher rollout (reference expert.py predict_expert_actions): sample
    the expert deterministically and shape to [B, chunk, A]."""
    out = expert_policy.predict_action_batch(
        expert_params, rng, obs, deterministic=True)
    acts = out.actions
    if acts.ndim == 2:
        acts = acts.reshape(acts.shape[0], -1, action_dim)
    return acts[:, :chunk_len, :action_dim]


def discounted_chunk_rewards(rewards: jax.Array, gamma: float) -> jax.Array:
    """Sum_i gamma^i r_i over the action chunk → [B, 1] (reference
    fsdp_rlt_ac_policy_worker.py _discounted_chunk_rewards)."""
    rewards = rewards.reshape(rewards.shape[0], -1).astype(jnp.float32)
    chunk = rewards.shape[-1]
    disc = jnp.power(gamma, jnp.arange(chunk, dtype=jnp.float32))
    return jnp.sum(rewards * disc, axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class ActorWeightSchedule:
    """BC/Q weight warmup→ramp schedule (reference _actor_objective_weights)."""

    enable: bool = False
    bc_weight: float = 1.0
    q_weight: float = 1.0
    warmup_updates: int = 0
    ramp_updates: int = 0
    warmup_bc_weight: Optional[float] = None
    warmup_q_weight: Optional[float] = None
    online_bc_weight: Optional[float] = None
    online_q_weight: Optional[float] = None

    def at(self, update_step: int) -> Dict[str, float]:
        if not self.enable:
            return {"bc_weight": self.bc_weight, "q_weight": self.q_weight,
                    "ramp_progress": 1.0}
        w_bc = self.warmup_bc_weight if self.warmup_bc_weight is not None \
            else self.bc_weight
        w_q = self.warmup_q_weight if self.warmup_q_weight is not None \
            else self.q_weight
        o_bc = self.online_bc_weight if self.online_bc_weight is not None \
            else self.bc_weight
        o_q = self.online_q_weight if self.online_q_weight is not None \
            else self.q_weight
        if update_step < self.warmup_updates:
            return {"bc_weight": w_bc, "q_weight": w_q, "ramp_progress": 0.0}
        if self.ramp_updates > 0:
            p = min(1.0, max(
                0.0,
                (update_step - self.warmup_updates + 1) / self.ramp_updates))
            return {
                "bc_weight": w_bc + p * (o_bc - w_bc),
                "q_weight": w_q + p * (o_q - w_q),
                "ramp_progress": p,
            }
        return {"bc_weight": o_bc, "q_weight": o_q, "ramp_progress": 1.0}
