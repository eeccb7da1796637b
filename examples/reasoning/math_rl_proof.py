"""Real-data math-RL learning proof on one TPU chip (BASELINE config 1 analog).

The reference's BASELINE config 1 is Qwen2.5-0.5B GRPO on GSM8K
(reference examples/reasoning/main_grpo.py + config/math). This image has no
pretrained checkpoints and no network egress, so this script runs the nearest
runnable analog with every real component of that pipeline (scaled up per
VERDICT round-2 item 5 from round-2's 8-byte answers):

  1. Train a byte-level BPE tokenizer (digit-atomic) on a synthetic
     multi-step GSM8K-style corpus (examples/reasoning/gsm_synth.py:
     chain-of-thought solutions, '#### N' final answers).
  2. SFT warmup of a from-scratch Qwen2-geometry model (8 layers, 512
     hidden, GQA 8/2, tied embeddings) on chain-of-thought targets — the
     "pretrained model" stand-in, stopped short of convergence.
  3. >=200 GRPO steps through the FULL production path: continuous-batching
     rollout engine (pallas decode, int8 weight quant, recompute-logprobs
     invariant auto-on), sympy verifier ladder, GRPO advantages,
     dynamic token-budget microbatching, PPO-clip update.
  4. Step-1 KL tripwire (approx_kl > 0.1 aborts: rollout/training logprob
     mismatch is a bug, not a tuning problem), greedy held-out accuracy
     before/after, reward curve stored as a parity baseline
     (reference tests/parity_tests/compare_baseline.py method).

Usage: python examples/reasoning/math_rl_proof.py [--sft-steps N] [--rl-steps N]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")

if os.environ.get("RLINF_FORCE_CPU"):  # dev smoke runs; sitecustomize pins TPU
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_greedy_evaluator(model_cfg, tok, examples, max_new=128):
    """Held-out greedy eval through the specialized eval runner
    (runners/eval_runner.py evaluate_reasoning — reference
    reasoning_eval_runner.py analog)."""
    from rlinf_tpu.data.datasets import PromptDataset
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.rollout.engine import RolloutEngine
    from rlinf_tpu.runners.eval_runner import evaluate_reasoning

    dataset = PromptDataset(list(examples))
    sp = SamplingParams(
        max_new_tokens=max_new, temperature=1.0, greedy=True,
        eos_token_id=tok.eos_id, pad_token_id=tok.pad_id,
    )
    eng = RolloutEngine(model_cfg, sp, prompt_bucket=64, weight_quant="none")

    def evaluate(params):
        res = evaluate_reasoning(
            params, model_cfg, tok, dataset,
            sampling=sp, batch_size=len(dataset.examples),
            max_prompt_len=64, seed=0, engine=eng,
        )
        texts = [r["response"] for r in res.per_example]
        return res.accuracy, texts

    return evaluate


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sft-steps", type=int, default=1200)
    parser.add_argument("--rl-steps", type=int, default=200)
    parser.add_argument("--log-dir", default="logs/math_rl_proof")
    args = parser.parse_args()

    import numpy as np

    from examples.reasoning.gsm_synth import (
        build_rl_examples, build_sft_examples, corpus_texts,
    )
    from rlinf_tpu.config import config_from_dict
    from rlinf_tpu.data.datasets import PromptDataset
    from rlinf_tpu.data.tokenizers import BPETokenizer
    from rlinf_tpu.runners import ReasoningRunner
    from rlinf_tpu.runners.sft_runner import SFTRunner
    from rlinf_tpu.utils import parity

    os.makedirs(args.log_dir, exist_ok=True)

    # ---- phase 0: tokenizer (digit-atomic BPE on the task corpus) ----
    t0 = time.perf_counter()
    tok = BPETokenizer.train(corpus_texts(3000, seed=7), num_merges=440)
    tok.save(os.path.join(args.log_dir, "tokenizer.json"))
    print(f"[tok] vocab {tok.vocab_size} in {time.perf_counter()-t0:.1f}s",
          flush=True)

    model = dict(
        vocab_size=768, hidden_size=512, intermediate_size=1408,
        num_layers=8, num_heads=8, num_kv_heads=2, max_seq_len=512,
        rope_theta=10000.0, dtype="bfloat16", qkv_bias=True,
        tie_word_embeddings=True,
    )
    assert model["vocab_size"] >= tok.vocab_size

    # ---- phase 1: SFT warmup on chain-of-thought targets ----
    sft_cfg = config_from_dict({
        "model": model,
        "optimizer": {"lr": 6e-4, "warmup_steps": 40},
        "runner": {
            "task_type": "sft", "max_steps": args.sft_steps,
            "rollout_batch_size": 96, "log_dir": args.log_dir + "/sft",
        },
        "data": {"max_prompt_len": 64},
        "sampling": {"max_new_tokens": 128, "eos_token_id": 1},
    })
    # Adaptive stop: segments of SFT with a greedy held-out eval between —
    # stop at PARTIAL competence (the "stops short of convergence" rule; on
    # this templated corpus full SFT memorizes the task and leaves RL no
    # headroom — observed ppl 1.015 at step ~800 on the easy corpus).
    from rlinf_tpu.config import config_from_dict as _cfd

    heldout_sft = build_rl_examples(96, seed=42)
    t0 = time.perf_counter()
    sft = SFTRunner(sft_cfg, tok,
                    PromptDataset(build_sft_examples(40000, seed=0)))
    sft_eval = make_greedy_evaluator(sft_cfg.model, tok, heldout_sft)
    segment = 120
    acc = 0.0
    while sft.global_step < args.sft_steps:
        sft.run(max_steps=min(sft.global_step + segment, args.sft_steps))
        acc, _ = sft_eval(sft.state.params)
        print(f"[sft] step {sft.global_step} greedy-acc {acc:.3f}",
              flush=True)
        if 0.10 <= acc <= 0.55:
            print("[sft] partial competence reached — stopping for RL "
                  "headroom", flush=True)
            break
    print(f"[sft] {sft.global_step} steps in {time.perf_counter()-t0:.1f}s, "
          f"stop acc {acc:.3f}", flush=True)
    sft_params = sft.state.params

    # ---- phase 2: GRPO through the full production path ----
    rl_cfg = config_from_dict({
        "model": model,
        "optimizer": {"lr": 2e-5, "warmup_steps": 10},
        "algorithm": {"adv_type": "grpo", "group_size": 8},
        "loss": {"clip_ratio_low": 0.2, "clip_ratio_high": 0.2,
                 "entropy_bonus": 0.001, "max_tokens_per_mb": 8192},
        "rollout": {"engine": "continuous", "num_slots": 64,
                    "decode_chunk": 16, "prompt_bucket": 64},
        "runner": {
            "task_type": "reasoning", "max_steps": args.rl_steps,
            "rollout_batch_size": 16, "log_dir": args.log_dir + "/rl",
            "seed": 1,
        },
        "sampling": {"max_new_tokens": 128, "temperature": 1.0,
                     "eos_token_id": 1},
        "data": {"max_prompt_len": 64},
    })
    rl_data = PromptDataset(build_rl_examples(20000, seed=1))
    runner = ReasoningRunner(
        rl_cfg, tok, rl_data,
        init_params_override=lambda rng: sft_params,
    )
    import jax as _jax

    if _jax.default_backend() == "tpu":
        assert runner.recompute_logprobs, (
            "TPU defaults (int8 + pallas decode) must auto-enable the "
            "logprob recompute invariant"
        )
    heldout = build_rl_examples(128, seed=99)
    rl_eval = make_greedy_evaluator(rl_cfg.model, tok, heldout)
    acc0, sample_texts = rl_eval(runner._policy_params())
    print(f"[eval] pre-RL greedy accuracy {acc0:.3f}", flush=True)
    print("[eval] sample:", repr(sample_texts[0][:160]), flush=True)

    t0 = time.perf_counter()
    first_metrics = runner.run_step()
    # Tripwire (VERDICT round-2): step-1 approx_kl >> 0 means the behavior
    # policy the engine reports is not the policy the learner computes —
    # a broken decode path, not a tuning problem. Fail loudly, never train on.
    kl0 = abs(first_metrics.get("actor/approx_kl", 0.0))
    print(f"[rl] step-1 approx_kl {kl0:.6f}", flush=True)
    if kl0 > 0.1:
        raise SystemExit(
            f"FATAL: step-1 actor/approx_kl={kl0:.4f} > 0.1 — rollout and "
            "training disagree about the policy's logprobs. Check "
            "rollout.decode_attn_impl / weight_quant vs the training path."
        )
    history = [first_metrics] + runner.run()
    dt = time.perf_counter() - t0

    rewards = [h["rollout/reward_mean"] for h in history]
    resp_len = float(np.mean([h["rollout/response_len_mean"] for h in history]))
    k = max(5, len(rewards) // 10)
    first, last = sum(rewards[:k]) / k, sum(rewards[-k:]) / k
    print(f"[rl] {len(rewards)} steps in {dt:.1f}s  "
          f"reward first-{k} {first:.3f} -> last-{k} {last:.3f}  "
          f"mean response len {resp_len:.1f} tok", flush=True)

    acc1, _ = rl_eval(runner._policy_params())
    print(f"[eval] post-RL greedy accuracy {acc0:.3f} -> {acc1:.3f}",
          flush=True)

    parity.save_baseline(
        os.path.join(args.log_dir, "baseline_reward.json"),
        rewards,
        meta={"task": "math_rl_proof", "metric": "rollout/reward_mean",
              "sft_steps": args.sft_steps, "rl_steps": args.rl_steps,
              "model": model, "tokenizer_vocab": tok.vocab_size},
    )
    summary = {
        "reward_first": first, "reward_last": last,
        "greedy_acc_pre": acc0, "greedy_acc_post": acc1,
        "mean_response_len_tokens": resp_len,
        "step1_approx_kl": kl0,
        "improved": last > first + 0.05, "rl_seconds": dt,
    }
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
