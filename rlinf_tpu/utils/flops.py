"""Analytic FLOPs/bytes accounting + speed-of-light estimates.

Reference analog: rlinf/utils/flops.py:45 (prefill/decode/train FLOPs ->
TFLOPs/GPU metrics in runners/reasoning_runner.py:322-357). Extended with a
roofline speed-of-light model so benchmarks report "fraction of light" rather
than bare numbers.
"""

from __future__ import annotations

import dataclasses

from rlinf_tpu.models.llm.config import LLMConfig


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_flops: float      # peak FLOP/s
    hbm_bw: float          # bytes/s
    hbm_bytes: float

    @staticmethod
    def v5e() -> "ChipSpec":
        # v5e peak: 394 TOPS int8, 197 TFLOP/s bf16, 819 GB/s HBM.
        # (Round-1 used 394e12 for bf16 — that is the int8 figure; all
        # MFU/SOL numbers were reported against a 2x-inflated roofline.)
        return ChipSpec("tpu-v5e", 197e12, 819e9, 16e9)

    @staticmethod
    def v5p() -> "ChipSpec":
        return ChipSpec("tpu-v5p", 459e12, 2765e9, 95e9)


def model_matmul_flops_per_token(cfg: LLMConfig) -> float:
    """Forward matmul FLOPs per token (2*params for the matmul weights)."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    per_layer = 2 * (
        d * cfg.q_dim + 2 * d * cfg.kv_dim + cfg.q_dim * d + 3 * d * f
    )
    lm = 2 * d * cfg.vocab_size
    return cfg.num_layers * per_layer + lm


def attention_flops(cfg: LLMConfig, seq_len: int, kv_len: float) -> float:
    """Per-token attention FLOPs at the given average kv length."""
    return cfg.num_layers * 2 * 2 * cfg.num_heads * cfg.head_dim_ * kv_len


def train_step_flops(cfg: LLMConfig, batch: int, seq_len: int) -> float:
    """fwd + bwd (2x fwd) matmul FLOPs + causal attention, for B*S tokens."""
    tokens = batch * seq_len
    mat = 3 * model_matmul_flops_per_token(cfg) * tokens
    attn = 3 * attention_flops(cfg, seq_len, seq_len / 2) * tokens
    return mat + attn


def prefill_flops(cfg: LLMConfig, batch: int, seq_len: int) -> float:
    tokens = batch * seq_len
    return (
        model_matmul_flops_per_token(cfg) * tokens
        + attention_flops(cfg, seq_len, seq_len / 2) * tokens
    )


def decode_step_bytes(cfg: LLMConfig, batch: int, kv_len: float) -> float:
    """HBM bytes per decode step: all weights + the batch's KV cache.

    Weights are counted at bf16 — the BASELINE convention: this roofline
    models the reference's bf16 serving stack on this chip, so bench
    ``vs_baseline`` compares our implementation (including optimizations
    like int8 weight-only decode) against the reference-workload bound, and
    can legitimately exceed what our own int8 byte count would allow."""
    weight_bytes = cfg.num_params() * 2  # bf16 baseline convention
    kv_bytes = (
        batch * cfg.num_layers * 2 * kv_len * cfg.kv_dim * 2
    )
    return weight_bytes + kv_bytes


def decode_sol_time(
    cfg: LLMConfig, chip: ChipSpec, batch: int, kv_len: float
) -> float:
    """Roofline lower bound for one decode step (whole batch, one token each)."""
    flops = batch * (
        model_matmul_flops_per_token(cfg)
        + attention_flops(cfg, 1, kv_len)
    )
    return max(flops / chip.bf16_flops, decode_step_bytes(cfg, batch, kv_len) / chip.hbm_bw)


def train_sol_time(cfg: LLMConfig, chip: ChipSpec, batch: int, seq_len: int) -> float:
    return train_step_flops(cfg, batch, seq_len) / chip.bf16_flops


def train_mfu(
    cfg: LLMConfig, chip: ChipSpec, batch: int, seq_len: int, seconds: float
) -> float:
    return train_step_flops(cfg, batch, seq_len) / (seconds * chip.bf16_flops)
