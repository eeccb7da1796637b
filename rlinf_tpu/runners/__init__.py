"""Driver loops (reference: rlinf/runners/)."""

from rlinf_tpu.runners.reasoning_runner import ReasoningRunner

__all__ = ["ReasoningRunner"]
