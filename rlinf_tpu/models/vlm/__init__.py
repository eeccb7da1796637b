from rlinf_tpu.models.vlm.reasoning import VLMConfig, VLMReasoningModel

__all__ = ["VLMConfig", "VLMReasoningModel"]
