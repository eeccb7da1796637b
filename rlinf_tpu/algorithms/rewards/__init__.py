"""Rule-based reward functions (reference: rlinf/algorithms/rewards/)."""

from rlinf_tpu.algorithms.rewards.math_verifier import (
    extract_answer,
    grade_answer,
    math_reward,
)

__all__ = ["extract_answer", "grade_answer", "math_reward"]
