"""Policy interface for embodied RL (functional-JAX).

Reference analog: BasePolicy (reference rlinf/models/embodiment/
base_policy.py:32) with ``default_forward`` (logprob/value/entropy for
training) and ``predict_action_batch`` (action sampling for rollout). The
reference's torch.compile + CUDA-graph capture hooks (:83-104) are subsumed
by ``jax.jit`` — callers jit the bound methods once and the whole
obs->action step is a single compiled program.

Policies are stateless: params are explicit pytrees, so the same object
serves learner and rollout with different param versions (the weight-sync
collapse of SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax


class PolicyOutput(NamedTuple):
    """predict_action_batch result (reference mlp_policy.py:296-320).
    NamedTuple => a pytree, so jitted predict functions can return it."""

    actions: jax.Array           # [B, action_dim] (env-facing)
    logprobs: jax.Array          # [B, action_dim] per-dim logprob
    values: Optional[jax.Array]  # [B] or None


class Policy:
    """Subclass contract; all methods pure functions of (params, ...)."""

    action_dim: int

    def init(self, rng: jax.Array) -> Any:
        raise NotImplementedError

    def default_forward(
        self, params, obs: Dict[str, jax.Array], actions: jax.Array
    ) -> Dict[str, jax.Array]:
        """-> {"logprobs": [B, A], "entropy": [B, A], "values": [B]}"""
        raise NotImplementedError

    def predict_action_batch(
        self, params, rng: jax.Array, obs: Dict[str, jax.Array], *,
        deterministic: bool = False,
    ) -> PolicyOutput:
        raise NotImplementedError

    def value(self, params, obs: Dict[str, jax.Array]) -> jax.Array:
        raise NotImplementedError

    def env_actions(self, policy_actions: jax.Array) -> jax.Array:
        """Map the policy's WIRE actions (what the learner trains on) to the
        env-facing actions. Identity by default; flow-SDE policies override
        to extract x1 from the denoising chain, discrete-bin policies to
        decode bin centers."""
        return policy_actions

    def partition_rules(self):
        """Embodied policies are small: replicate by default."""
        from jax.sharding import PartitionSpec as P

        return [(r".*", P())]
