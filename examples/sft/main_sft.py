"""Supervised fine-tuning entry (reference workers/sft analog)."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--data-path", required=True,
                        help="jsonl with prompt + answer/response fields")
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args()

    from rlinf_tpu.config import load_config
    from rlinf_tpu.data.datasets import PromptDataset
    from rlinf_tpu.data.tokenizers import ByteTokenizer, HFTokenizer
    from rlinf_tpu.runners.sft_runner import SFTRunner

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

    dataset = PromptDataset.from_jsonl(args.data_path)
    runner = SFTRunner(cfg, tokenizer, dataset, init_params_override=init_override)
    runner.run()


if __name__ == "__main__":
    main()
