"""Real-data math-RL learning proof on one TPU chip (BASELINE config 1 analog).

The reference's BASELINE config 1 is Qwen2.5-0.5B GRPO on GSM8K
(reference examples/reasoning/main_grpo.py + config/math). This image has no
pretrained checkpoints and no network egress, so this script runs the nearest
runnable analog with every real component of that pipeline:

  1. SFT warmup of a from-scratch byte-level decoder on generated 2-digit
     arithmetic word problems (stops deliberately short of convergence so RL
     has headroom) — the stand-in for "pretrained model".
  2. >=120 GRPO steps through the full ReasoningRunner path (rollout engine
     -> sympy math verifier -> GRPO advantages -> PPO-clip update) on TPU.
  3. Reward curve logged to metrics.jsonl and stored as a parity baseline
     (reference tests/parity_tests/compare_baseline.py method) so future
     rounds regression-test against it.

Done-criterion (VERDICT.md round-1 item 4): a committed learning curve with
reward going up on verifier-graded math data.

Usage: python examples/reasoning/math_rl_proof.py [--sft-steps N] [--rl-steps N]
"""

import argparse
import dataclasses
import json
import os
import random
import sys
import time

sys.path.insert(0, ".")

if os.environ.get("RLINF_FORCE_CPU"):  # dev smoke runs; sitecustomize pins TPU
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_dataset(n, seed):
    """Mixed 2-digit add/sub and 1-digit mul problems, sympy-gradeable."""
    from rlinf_tpu.data.datasets import PromptDataset, PromptExample

    rng = random.Random(seed)
    examples = []
    for _ in range(n):
        kind = rng.randrange(3)
        if kind == 0:
            a, b = rng.randint(10, 99), rng.randint(10, 99)
            q, ans = f"{a}+{b}", a + b
        elif kind == 1:
            a, b = rng.randint(10, 99), rng.randint(10, 99)
            if a < b:
                a, b = b, a
            q, ans = f"{a}-{b}", a - b
        else:
            a, b = rng.randint(2, 9), rng.randint(2, 12)
            q, ans = f"{a}*{b}", a * b
        examples.append(
            PromptExample(prompt=f"Q: {q}=?\nA: ", answer=str(ans))
        )
    return PromptDataset(examples)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sft-steps", type=int, default=350)
    parser.add_argument("--rl-steps", type=int, default=140)
    parser.add_argument("--log-dir", default="logs/math_rl_proof")
    args = parser.parse_args()

    from rlinf_tpu.config import config_from_dict
    from rlinf_tpu.data.tokenizers import ByteTokenizer
    from rlinf_tpu.runners import ReasoningRunner
    from rlinf_tpu.runners.sft_runner import SFTRunner
    from rlinf_tpu.utils import parity

    tok = ByteTokenizer()
    model = dict(
        vocab_size=tok.vocab_size + 6, hidden_size=384, intermediate_size=1024,
        num_layers=6, num_heads=6, num_kv_heads=2, max_seq_len=256,
        rope_theta=10000.0, dtype="bfloat16", qkv_bias=True,
        tie_word_embeddings=True,
    )
    os.makedirs(args.log_dir, exist_ok=True)

    # ---- phase 1: SFT warmup (the "pretrained model" stand-in) ----
    sft_cfg = config_from_dict({
        "model": model,
        "optimizer": {"lr": 1e-3, "warmup_steps": 20},
        "runner": {
            "task_type": "sft", "max_steps": args.sft_steps,
            "rollout_batch_size": 128, "log_dir": args.log_dir + "/sft",
        },
        "data": {"max_prompt_len": 32},
        "sampling": {"max_new_tokens": 8, "eos_token_id": 1},
    })
    t0 = time.perf_counter()
    sft = SFTRunner(sft_cfg, tok, build_dataset(8192, seed=0))
    hist = sft.run()
    print(f"[sft] {args.sft_steps} steps in {time.perf_counter()-t0:.1f}s, "
          f"final nll_sum {hist[-1].get('sft/nll_sum', -1):.1f}", flush=True)
    sft_params = sft.state.params

    # ---- phase 2: GRPO through the full runner path ----
    rl_cfg = config_from_dict({
        "model": model,
        "optimizer": {"lr": 3e-5, "warmup_steps": 10},
        "algorithm": {"adv_type": "grpo", "group_size": 8},
        "loss": {"clip_ratio_low": 0.2, "clip_ratio_high": 0.2, "entropy_bonus": 0.001},
        "runner": {
            "task_type": "reasoning", "max_steps": args.rl_steps,
            "rollout_batch_size": 24, "log_dir": args.log_dir + "/rl",
            "seed": 1,
        },
        "sampling": {"max_new_tokens": 8, "temperature": 1.0,
                     "eos_token_id": 1},
        "data": {"max_prompt_len": 32},
    })
    runner = ReasoningRunner(
        rl_cfg, tok, build_dataset(4096, seed=1),
        init_params_override=lambda rng: sft_params,
    )
    t0 = time.perf_counter()
    first_metrics = runner.run_step()
    # Tripwire (VERDICT round-2): step-1 approx_kl >> 0 means the behavior
    # policy the engine reports is not the policy the learner computes —
    # a broken decode path, not a tuning problem. Fail loudly, never train on.
    kl0 = abs(first_metrics.get("actor/approx_kl", 0.0))
    if kl0 > 0.1:
        raise SystemExit(
            f"FATAL: step-1 actor/approx_kl={kl0:.4f} > 0.1 — rollout and "
            "training disagree about the policy's logprobs. Check "
            "rollout.decode_attn_impl / weight_quant vs the training path."
        )
    history = [first_metrics] + runner.run()
    dt = time.perf_counter() - t0

    rewards = [h["rollout/reward_mean"] for h in history]
    k = max(5, len(rewards) // 10)
    first, last = sum(rewards[:k]) / k, sum(rewards[-k:]) / k
    print(f"[rl] {len(rewards)} steps in {dt:.1f}s  "
          f"reward first-{k} {first:.3f} -> last-{k} {last:.3f}", flush=True)

    parity.save_baseline(
        os.path.join(args.log_dir, "baseline_reward.json"),
        rewards,
        meta={"task": "math_rl_proof", "metric": "rollout/reward_mean",
              "sft_steps": args.sft_steps, "rl_steps": args.rl_steps},
    )
    summary = {"reward_first": first, "reward_last": last,
               "improved": last > first + 0.05, "rl_seconds": dt}
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
