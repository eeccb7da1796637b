"""GRPO/PPO reasoning RL entry point.

TPU-native analog of reference examples/reasoning/main_grpo.py:39 (Hydra main
-> validate_cfg -> Cluster -> WorkerGroups -> ReasoningRunner). Here: load
config -> build runner -> run. Same CLI shape as Hydra: positional overrides
``a.b=c`` after ``--config``.

Usage:
  python examples/reasoning/main_grpo.py --config examples/reasoning/config/grpo_demo_tiny.yaml
  python examples/reasoning/main_grpo.py --config ... optimizer.lr=2e-6 runner.max_steps=200
"""

import argparse
import sys

sys.path.insert(0, ".")  # repo root


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--model-path", default=None,
                        help="local HF checkpoint dir (Qwen2/Llama family)")
    parser.add_argument("--data-path", default=None,
                        help="jsonl with prompt/answer fields (e.g. GSM8K)")
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args()

    from rlinf_tpu.config import load_config
    from rlinf_tpu.data.datasets import PromptDataset, PromptExample
    from rlinf_tpu.data.tokenizers import ByteTokenizer, HFTokenizer
    from rlinf_tpu.parallel.distributed import initialize_distributed
    from rlinf_tpu.runners import ReasoningRunner

    initialize_distributed()
    cfg = load_config(args.config, args.overrides)

    init_override = None
    if args.model_path:
        from rlinf_tpu.models.llm.hf_import import load_hf_pretrained

        model_cfg, params = load_hf_pretrained(args.model_path, dtype=cfg.model.dtype)
        cfg = type(cfg)(**{**cfg.__dict__, "model": model_cfg})
        tokenizer = HFTokenizer(args.model_path)
        init_override = lambda rng: params
    else:
        tokenizer = ByteTokenizer()

    if args.data_path:
        dataset = PromptDataset.from_jsonl(
            args.data_path, max_examples=cfg.data.max_examples
        )
    else:
        # synthetic arithmetic prompts with verifiable answers
        import random

        rng = random.Random(0)
        examples = []
        for _ in range(512):
            a, b = rng.randint(2, 99), rng.randint(2, 99)
            examples.append(
                PromptExample(
                    prompt=f"Compute {a} + {b}. Final answer: ",
                    answer=str(a + b),
                )
            )
        dataset = PromptDataset(examples)

    runner = ReasoningRunner(
        cfg, tokenizer, dataset, init_params_override=init_override
    )
    runner.run()


if __name__ == "__main__":
    main()
