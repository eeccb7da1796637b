"""Pallas TPU kernels (the in-tree replacement for the reference's external
CUDA kernel deps — flash-attn, TransformerEngine fused attention, liger;
SURVEY.md §2.9)."""
