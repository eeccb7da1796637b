"""Driver loops (reference: rlinf/runners/)."""

from rlinf_tpu.runners.reasoning_runner import ReasoningRunner
from rlinf_tpu.runners.vlm_reasoning_runner import VLMReasoningRunner

__all__ = ["ReasoningRunner", "VLMReasoningRunner"]
