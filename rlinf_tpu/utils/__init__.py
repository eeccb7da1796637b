"""Metrics, timers, checkpointing, FLOPs accounting (reference: rlinf/utils/)."""
