"""VLM reasoning GRPO: [image | question] -> graded free-text answer.

Run: python examples/vlm/main_vlm_grpo.py
Reference analog: VLM GRPO e2e configs (reference tests/e2e_tests/) and the
VLM SFT worker. Demonstrates the full multimodal RL path on a synthetic
color-VQA task: optional VLM SFT warmup, then GRPO where reward is only
earnable by conditioning generated text on the image.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from rlinf_tpu.config import (
    AlgorithmConfig, DataConfig, RunnerConfig, TrainerConfig,
)
from rlinf_tpu.data.datasets import VQADataset, VQAExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.embodiment.vit import ViTConfig
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.models.vlm import VLMReasoningModel
from rlinf_tpu.runners.vlm_reasoning_runner import VLMReasoningRunner
from rlinf_tpu.runners.vlm_sft_runner import VLMSFTRunner
from rlinf_tpu.training.learner import PolicyLossConfig
from rlinf_tpu.training.train_state import OptimizerConfig

COLORS = {"red": (1.0, 0.1, 0.1), "green": (0.1, 1.0, 0.1),
          "blue": (0.1, 0.1, 1.0)}


def color_dataset(n=96, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        name = list(COLORS)[i % 3]
        img = np.ones((32, 32, 3), np.float32) * np.asarray(COLORS[name])
        img += rng.normal(0, 0.05, img.shape).astype(np.float32)
        out.append(VQAExample(image=np.clip(img, 0, 1),
                              question="what color?", answers=[name]))
    return VQADataset(out)


def main():
    cfg = TrainerConfig(
        model=LLMConfig(
            vocab_size=258, hidden_size=96, intermediate_size=192,
            num_layers=3, num_heads=4, num_kv_heads=2, max_seq_len=128,
            dtype="float32",
        ),
        sampling=SamplingParams(max_new_tokens=8, temperature=1.0,
                                eos_token_id=1, pad_token_id=0),
        optimizer=OptimizerConfig(lr=2e-3, clip_grad=1.0),
        loss=PolicyLossConfig(clip_ratio_low=0.2, clip_ratio_high=0.2,
                              entropy_bonus=0.001),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=60, seed=0,
                            log_dir="logs/vlm_grpo_demo"),
        data=DataConfig(max_prompt_len=16),
    )
    model = VLMReasoningModel(
        vlm_cfg=cfg.model,
        vit_cfg=ViTConfig(image_size=32, patch_size=16, hidden=48,
                          layers=2, heads=4),
    )
    ds = color_dataset()
    tok = ByteTokenizer()

    # SFT warmup (VLM SFT worker analog), then GRPO
    import dataclasses as dc

    sft = VLMSFTRunner(
        dc.replace(cfg, runner=dc.replace(cfg.runner, max_steps=40)),
        tok, ds, model,
    )
    sft_hist = sft.run()
    print(f"sft loss {sft_hist[0]['sft/loss']:.3f} -> "
          f"{sft_hist[-1]['sft/loss']:.3f}")

    runner = VLMReasoningRunner(cfg, tok, ds, model)
    runner.state = runner.state._replace(params=sft.state.params)
    hist = runner.run()
    r0 = np.mean([h["rollout/reward_mean"] for h in hist[:5]])
    r1 = np.mean([h["rollout/reward_mean"] for h in hist[-5:]])
    print(f"reward {r0:.3f} -> {r1:.3f}")


if __name__ == "__main__":
    main()
