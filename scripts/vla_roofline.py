"""Attach analytic rooflines (vs_sol) to the full-geometry VLA numbers.

VERDICT r4 item 7: logs/vla_fullscale.json proved fit + latency but carried
no SOL context. This computes the analytic speed-of-light for the exact
measured configurations (scripts/vla_fullscale.py geometries) via
rlinf_tpu/utils/flops.py and rewrites the log with ``*_sol_ms`` /
``*_vs_sol`` fields. Pure arithmetic — no chip required; latencies stay the
measured ones.

Reference metric style: BASELINE.md BEHAVIOR ms/step rows
(reference docs/source-en/rst_source/resources/blog/behavior_system_optimization.rst:8-37).
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlinf_tpu.models.llm.config import LLMConfig  # noqa: E402
from rlinf_tpu.utils import flops as F  # noqa: E402


def pi0_sols(chip):
    # geometries from scripts/vla_fullscale.py _build_pi0
    gemma_2b = LLMConfig(
        vocab_size=257152, hidden_size=2048, intermediate_size=16384,
        num_layers=18, num_heads=8, num_kv_heads=1, head_dim=256,
        rope_theta=1e4, tie_word_embeddings=True, qkv_bias=False,
        max_seq_len=1024,
    )
    n_patches = (224 // 14) ** 2
    param_bytes = 3.255e9 * 2  # measured tree, bf16
    rollout_sol = F.pi0_rollout_sol_time(
        gemma_2b, chip, batch=8, num_patches=n_patches, text_len=32,
        expert_hidden=1024, expert_ffn=4096, action_chunk=50,
        num_flow_steps=10, vit_hidden=1152, vit_layers=27,
        param_bytes=param_bytes,
    )
    # PPO update at B=2: behavior fwd (1 flow rollout) + grad (3x fwd over
    # prefix+flow chain) approximated as 3x the rollout compute at B=2 plus
    # the two-pass parameter-group scheme's extra fwd (4 passes total at
    # this memory-bound geometry) + optimizer stream (3 tree passes).
    rollout2 = F.pi0_rollout_sol_time(
        gemma_2b, chip, batch=2, num_patches=n_patches, text_len=32,
        expert_hidden=1024, expert_ffn=4096, action_chunk=50,
        num_flow_steps=10, vit_hidden=1152, vit_layers=27,
        param_bytes=param_bytes,
    )
    train_sol = 4 * rollout2 + 3 * param_bytes / chip.hbm_bw
    return rollout_sol, train_sol


def openvla_sol(chip):
    trunk = LLMConfig.qwen2_7b()
    n_patches = (224 // 14) ** 2
    return F.openvla_decode_sol_time(
        trunk, chip, batch=8, num_patches=n_patches, text_len=32,
        action_tokens=7, vit_hidden=1024, vit_layers=24, n_vits=1,
    )


def main():
    chip = F.ChipSpec.v5e()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "logs", "vla_fullscale.json")
    with open(path) as f:
        log = json.load(f)

    ro_sol, tr_sol = pi0_sols(chip)
    ov_sol = openvla_sol(chip)
    log["pi0_rollout_sol_ms"] = round(ro_sol * 1e3, 1)
    log["pi0_rollout_vs_sol"] = round(
        ro_sol * 1e3 / log["pi0_rollout_ms_per_chunk_b8"], 3)
    log["pi0_ppo_update_sol_ms"] = round(tr_sol * 1e3, 1)
    log["pi0_ppo_update_vs_sol"] = round(
        tr_sol * 1e3 / log["pi0_ppo_update_ms_b2"], 3)
    log["openvla_decode_sol_ms"] = round(ov_sol * 1e3, 1)
    log["openvla_decode_vs_sol"] = round(
        ov_sol * 1e3 / log["openvla_decode_ms_b8"], 3)
    log["sol_note"] = (
        "vs_sol = analytic roofline / measured (1.0 = hardware limit; "
        "decode SOL uses the bf16 weight-byte BASELINE convention, so the "
        "int8-trunk OpenVLA path may exceed 1.0). utils/flops.py "
        "pi0_rollout_sol_time / openvla_decode_sol_time."
    )
    with open(path, "w") as f:
        json.dump(log, f, indent=1)
    print(json.dumps(log, indent=1))


if __name__ == "__main__":
    main()
