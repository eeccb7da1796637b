"""RL algorithm library: advantages, losses, rewards (reference: rlinf/algorithms/).

All math runs in float32 under jit; registries mirror the reference's
(rlinf/algorithms/registry.py:33,59) so configs select estimators by name.
"""

from rlinf_tpu.algorithms.registry import (
    get_advantage_fn,
    get_policy_loss_fn,
    register_advantage,
    register_policy_loss,
)
from rlinf_tpu.algorithms import advantages as _advantages  # noqa: F401  (registration)
from rlinf_tpu.algorithms import losses as _losses  # noqa: F401  (registration)

__all__ = [
    "get_advantage_fn",
    "get_policy_loss_fn",
    "register_advantage",
    "register_policy_loss",
]
