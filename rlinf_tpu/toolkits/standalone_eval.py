"""Standalone checkpoint evaluation, outside any training run.

Reference analog: evaluations/eval_embodied_agent.py and
toolkits/standalone_eval_scripts/ — point the tool at a checkpoint and an
env/dataset and get a metrics table, no runner state needed.

Two modes:
  reasoning — greedy accuracy of an LLM checkpoint over a prompt/answer
              jsonl (wraps runners/eval_runner.evaluate_reasoning);
  embodied  — deterministic-policy rollout metrics over a registered
              VectorEnv (success rate / return over N episodes).

CLI:
    python -m rlinf_tpu.toolkits.standalone_eval reasoning \
        --checkpoint CKPT_DIR --dataset data.jsonl [--preset qwen2_0_5b]
    python -m rlinf_tpu.toolkits.standalone_eval embodied \
        --checkpoint CKPT_DIR --env point_reach --steps 200
"""

from __future__ import annotations

import argparse
import json


def eval_reasoning_cli(args) -> dict:
    import jax

    from rlinf_tpu.data.datasets import PromptDataset
    from rlinf_tpu.data.tokenizers import ByteTokenizer, HFTokenizer
    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.rollout.engine import SamplingParams
    from rlinf_tpu.runners.eval_runner import evaluate_reasoning, print_eval_table
    from rlinf_tpu.utils.checkpoint import CheckpointManager

    model_cfg = getattr(LLMConfig, args.preset)()
    params = init_params(model_cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        ckpt = CheckpointManager(args.checkpoint)
        state = ckpt.restore({"params": params})
        params = state["params"]
    tokenizer = (
        ByteTokenizer() if args.tokenizer == "byte" else HFTokenizer(args.tokenizer)
    )
    dataset = PromptDataset.from_jsonl(args.dataset)
    result = evaluate_reasoning(
        params,
        model_cfg,
        tokenizer,
        dataset,
        sampling=SamplingParams(max_new_tokens=args.max_new_tokens, greedy=True),
        batch_size=args.batch_size,
        max_examples=args.max_examples,
    )
    print_eval_table({args.dataset: result})
    return {"accuracy": result.accuracy, "num_examples": result.num_examples}


def eval_embodied_cli(args) -> dict:
    import jax
    import numpy as np

    from rlinf_tpu.envs import get_env_cls
    from rlinf_tpu.models import get_model
    from rlinf_tpu.rollout.env_loop import EnvLoop
    from rlinf_tpu.utils.checkpoint import CheckpointManager

    env = get_env_cls(args.env)(num_envs=args.num_envs, seed=args.seed)
    policy = get_model(
        args.model,
        obs_dim=int(np.prod(env.obs_spec["states"])),
        action_dim=env.action_dim,
    )
    params = policy.init(jax.random.PRNGKey(args.seed))
    if args.checkpoint:
        ckpt = CheckpointManager(args.checkpoint)
        state = ckpt.restore({"params": params})
        params = state["params"]
    loop = EnvLoop([env], policy)
    loop.reset()
    loop.interact(
        params, jax.random.PRNGKey(args.seed + 1), args.steps, deterministic=True
    )
    metrics = {f"eval/{k}": float(v) for k, v in loop.env_metrics().items()}
    for k, v in sorted(metrics.items()):
        print(f"{k:32s} {v:.4f}")
    return metrics


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("reasoning")
    pr.add_argument("--checkpoint", default=None)
    pr.add_argument("--dataset", required=True)
    pr.add_argument("--preset", default="qwen2_0_5b")
    pr.add_argument("--tokenizer", default="byte")
    pr.add_argument("--batch-size", type=int, default=32)
    pr.add_argument("--max-new-tokens", type=int, default=512)
    pr.add_argument("--max-examples", type=int, default=None)

    pe = sub.add_parser("embodied")
    pe.add_argument("--checkpoint", default=None)
    pe.add_argument("--env", default="point_reach")
    pe.add_argument("--model", default="mlp_policy")
    pe.add_argument("--num-envs", type=int, default=16)
    pe.add_argument("--steps", type=int, default=200)
    pe.add_argument("--seed", type=int, default=0)

    args = ap.parse_args(argv)
    out = eval_reasoning_cli(args) if args.cmd == "reasoning" else eval_embodied_cli(args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
