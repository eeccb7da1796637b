"""Standalone evaluation: greedy decode + rule-based scoring over a dataset.

Reference analog: the eval runners + standalone eval scripts
(reference rlinf/runners eval runners, evaluations/eval_embodied_agent.py,
toolkits/standalone_eval_scripts) and the aggregated table printing of
utils/metric_utils.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from rlinf_tpu.algorithms.rewards.math_verifier import batch_math_rewards
from rlinf_tpu.data.datasets import PromptDataset
from rlinf_tpu.data.io_struct import RolloutRequest
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.rollout.engine import RolloutEngine


@dataclasses.dataclass
class EvalResult:
    accuracy: float
    num_examples: int
    mean_response_len: float
    seconds: float
    per_example: List[Dict]


def evaluate_reasoning(
    params,
    model_cfg: LLMConfig,
    tokenizer,
    dataset: PromptDataset,
    *,
    sampling: Optional[SamplingParams] = None,
    reward_fn: Callable = batch_math_rewards,
    batch_size: int = 32,
    max_prompt_len: int = 512,
    max_examples: Optional[int] = None,
    attn_impl: str = "xla",
    seed: int = 0,
) -> EvalResult:
    """Greedy (or sampled, for pass@k-style eval) accuracy over a dataset."""
    sampling = sampling or SamplingParams(max_new_tokens=512, greedy=True)
    engine = RolloutEngine(model_cfg, sampling, attn_impl=attn_impl)
    n = min(len(dataset), max_examples or len(dataset))
    rng = jax.random.PRNGKey(seed)
    t0 = time.perf_counter()
    records: List[Dict] = []
    for start in range(0, n, batch_size):
        batch = [dataset[i] for i in range(start, min(start + batch_size, n))]
        # pad the final partial batch to keep jit shapes stable
        pad_count = batch_size - len(batch)
        padded = batch + [batch[-1]] * pad_count
        request = RolloutRequest(
            prompt_ids=[
                tokenizer.encode(ex.prompt)[:max_prompt_len] for ex in padded
            ],
            answers=[ex.answer for ex in padded],
        )
        rng, sub = jax.random.split(rng)
        result = engine.rollout(params, request, sub)
        texts = result.response_texts(tokenizer)
        scores = reward_fn(texts, result.answers)
        for i, ex in enumerate(batch):
            records.append(
                {
                    "prompt": ex.prompt,
                    "answer": ex.answer,
                    "response": texts[i],
                    "score": float(scores[i]),
                    "response_len": int(result.response_lengths[i]),
                }
            )
    seconds = time.perf_counter() - t0
    scores = [r["score"] for r in records]
    return EvalResult(
        accuracy=float(np.mean(scores)) if scores else 0.0,
        num_examples=len(records),
        mean_response_len=float(np.mean([r["response_len"] for r in records]))
        if records else 0.0,
        seconds=seconds,
        per_example=records,
    )


def print_eval_table(results: Dict[str, EvalResult]):
    """Aggregated table (reference metric_utils table printing)."""
    name_w = max(len(k) for k in results) if results else 4
    print(f"{'task':<{name_w}}  acc      n     len    s")
    for name, r in results.items():
        print(
            f"{name:<{name_w}}  {r.accuracy:6.4f}  {r.num_examples:5d} "
            f"{r.mean_response_len:6.1f}  {r.seconds:6.1f}"
        )
