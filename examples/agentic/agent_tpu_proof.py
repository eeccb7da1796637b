"""Agentic RL learning proof ON THE TPU chip (VERDICT round-2 weak #8).

Runs the multi-turn tool-calling AgentRunner (AgentLoopWorker analog) on the
real chip: rollouts interleave model decode with a calculator tool, per-turn
loss masks exclude tool outputs, GRPO trains on the full trajectory. The
reward is dense (fraction of chars equal to 'a' across the model's OWN turns)
so a from-scratch model shows a rising curve in ~40 steps — the point is
on-hardware evidence for the agent path end-to-end, not task difficulty.

Usage: python examples/agentic/agent_tpu_proof.py [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--log-dir", default="logs/agent_tpu_proof")
    args = ap.parse_args()

    import numpy as np
    import jax

    from rlinf_tpu.agents import AgentLoopConfig, CalculatorTool, ToolRegistry
    from rlinf_tpu.config import AlgorithmConfig, RunnerConfig, TrainerConfig
    from rlinf_tpu.data.datasets import PromptDataset, PromptExample
    from rlinf_tpu.data.tokenizers import ByteTokenizer
    from rlinf_tpu.models.llm.config import LLMConfig
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.runners.agent_runner import AgentRunner
    from rlinf_tpu.training.train_state import OptimizerConfig
    from rlinf_tpu.utils import parity

    os.makedirs(args.log_dir, exist_ok=True)
    print(f"[agent] backend={jax.default_backend()}", flush=True)

    cfg = TrainerConfig(
        model=LLMConfig(
            vocab_size=258, hidden_size=128, intermediate_size=256,
            num_layers=4, num_heads=4, num_kv_heads=2, max_seq_len=512,
        ),
        sampling=SamplingParams(max_new_tokens=24, temperature=1.0,
                                eos_token_id=-1),
        optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=args.steps,
                            log_dir=args.log_dir, seed=0),
    )

    def reward_fn(texts, answers):
        return [
            (sum(c == "a" for c in t) / max(len(t), 1)) if t else 0.0
            for t in texts
        ]

    dataset = PromptDataset(
        [PromptExample(f"task {i}: ", "unused") for i in range(64)]
    )
    runner = AgentRunner(
        cfg, ByteTokenizer(), dataset,
        tools=ToolRegistry([CalculatorTool()]),
        reward_fn=reward_fn,
        loop_cfg=AgentLoopConfig(max_turns=2, max_total_len=256),
    )
    t0 = time.perf_counter()
    hist = runner.run()
    dt = time.perf_counter() - t0

    rewards = [h["agent/reward_mean"] for h in hist]
    k = max(5, len(rewards) // 8)
    first, last = float(np.mean(rewards[:k])), float(np.mean(rewards[-k:]))
    turns = float(np.mean([h.get("agent/num_turns_mean", 0.0) for h in hist]))
    print(f"[agent] {len(rewards)} steps in {dt:.1f}s  reward {first:.4f} -> "
          f"{last:.4f}  mean turns {turns:.2f}", flush=True)

    parity.save_baseline(
        os.path.join(args.log_dir, "baseline_reward.json"), rewards,
        meta={"task": "agent_tpu", "metric": "rollout/reward_mean",
              "steps": args.steps, "backend": jax.default_backend()},
    )
    summary = {
        "reward_first": first, "reward_last": last,
        "improved": last > max(2 * first, first + 0.02),
        "mean_turns": turns, "seconds": dt,
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
