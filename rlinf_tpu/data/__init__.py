"""Data layer: rollout batch structs, datasets, replay buffer (reference: rlinf/data/)."""

from rlinf_tpu.data.io_struct import RolloutRequest, RolloutResult, TrainBatch, build_train_batch

__all__ = ["RolloutRequest", "RolloutResult", "TrainBatch", "build_train_batch"]
