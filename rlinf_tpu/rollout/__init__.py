"""On-device autoregressive rollout engine (replaces SGLang/vLLM embedding)."""

from rlinf_tpu.rollout.engine import RolloutEngine

__all__ = ["RolloutEngine"]
