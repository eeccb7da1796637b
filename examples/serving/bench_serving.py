"""Serving throughput bench: continuous-batching engine under mixed lengths.

The static-batch bench (bench.py) measures raw decode bandwidth; THIS
measures the serving scheduler — slot-pool continuous batching over a
long-tail length mix (the workload SGLang-style engines exist for,
reference rlinf/hybrid_engines/sglang). Reports tokens/s and slot
utilization on the flagship model with production defaults (int8 weight-only
decode + pallas packed decode attention).

Usage: python examples/serving/bench_serving.py [--requests N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=192)
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--kv-quant", default="none", choices=["none", "int8"])
    ap.add_argument("--engine", default="continuous",
                    choices=["continuous", "paged"])
    ap.add_argument("--budget", type=int, default=0,
                    help="fixed per-request budget (0 = long-tail mix)")
    ap.add_argument("--mega", action="store_true",
                    help="whole-step decode megakernel + fused lm-head "
                         "sampler (int8 weights + int8 KV implied)")
    ap.add_argument("--log-dir", default="logs/serving_bench")
    args = ap.parse_args()

    import numpy as np
    import jax

    from rlinf_tpu.data.io_struct import RolloutRequest
    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine

    os.makedirs(args.log_dir, exist_ok=True)
    on_tpu = jax.default_backend() == "tpu"
    cfg = LLMConfig.qwen2_0_5b() if on_tpu else LLMConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    # long-tail mix: short chats + a few long generations
    if args.budget:
        budgets = np.full(args.requests, args.budget)
    else:
        budgets = rng.choice([32, 64, 128, 256], size=args.requests,
                             p=[0.35, 0.3, 0.25, 0.1])
    prompts = [list(rng.integers(2, cfg.vocab_size - 1,
                                 rng.integers(8, 192)))
               for _ in range(args.requests)]
    sp = SamplingParams(max_new_tokens=256, temperature=1.0, eos_token_id=-1)
    if args.engine == "paged":
        from rlinf_tpu.rollout.paged_engine import PagedContinuousEngine

        eng = PagedContinuousEngine(
            cfg, sp, num_slots=args.slots, max_seq_len=512,
            prompt_bucket=64, decode_chunk=32, page_size=16,
            attn_impl="pallas" if on_tpu else "xla",
        )
    elif args.mega:
        # hybrid: per-layer kernels at large pool sizes, megakernel once
        # compaction shrinks the pool (measured v5e crossover ~128 slots)
        eng = ContinuousBatchingEngine(
            cfg, sp, num_slots=args.slots, max_seq_len=512, prompt_bucket=64,
            decode_chunk=32, weight_quant="int8", kv_quant="int8",
            decode_attn_impl="pallas" if on_tpu else "xla",
            use_mega="auto",
            sampler_impl="fused" if on_tpu else None,
        )
    else:
        eng = ContinuousBatchingEngine(
            cfg, sp, num_slots=args.slots, max_seq_len=512, prompt_bucket=64,
            decode_chunk=32, weight_quant="int8" if on_tpu else "none",
            kv_quant=args.kv_quant,
            decode_attn_impl="pallas" if on_tpu else "xla",
        )
    request = RolloutRequest(
        prompt_ids=[[int(t) for t in p] for p in prompts],
        answers=[""] * args.requests,
        max_new_tokens=[int(b) for b in budgets],
    )

    # warm (compile all refill shapes)
    eng.rollout(params, request, jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    out = eng.rollout(params, request, jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    gen_tokens = int(out.response_mask.sum())
    summary = {
        "requests": args.requests,
        "slots": args.slots,
        "engine": args.engine,
        "mega": bool(args.mega),
        "kv_quant": "int8" if args.mega else args.kv_quant,
        "generated_tokens": gen_tokens,
        "seconds": round(dt, 3),
        "tokens_per_s": round(gen_tokens / dt, 1),
        "mean_response_len": round(float(out.response_mask.sum(1).mean()), 1),
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
