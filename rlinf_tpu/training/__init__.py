"""Sharded train state and jitted update steps.

Replaces the reference's Megatron/FSDP model managers + actor workers
(reference rlinf/hybrid_engines/megatron/megatron_model_manager.py:178,
rlinf/workers/actor/fsdp_actor_worker.py:190): one donated-buffer jitted
train step per algorithm, sharded via pjit over the learner mesh.
"""

from rlinf_tpu.training.train_state import (
    TrainState,
    make_optimizer,
    create_train_state,
)
from rlinf_tpu.training.learner import make_policy_train_step, make_logprob_fn

__all__ = [
    "TrainState",
    "make_optimizer",
    "create_train_state",
    "make_policy_train_step",
    "make_logprob_fn",
]
