"""Embodied policies (reference: rlinf/models/embodiment/, BasePolicy at
base_policy.py:32). Functional-JAX policy families registered in the model
registry."""

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.mlp_policy import MLPGaussianPolicy
from rlinf_tpu.models.embodiment.cnn_policy import CNNGaussianPolicy
from rlinf_tpu.models.embodiment import registry as _registry  # noqa: F401

__all__ = ["Policy", "PolicyOutput", "MLPGaussianPolicy", "CNNGaussianPolicy"]
