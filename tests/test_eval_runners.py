"""Specialized eval runners (VERDICT r3 item 6): pass@k reasoning eval,
episodic embodied eval, metric tables.

Reference analogs: rlinf/runners/reasoning_eval_runner.py (sampled eval),
rlinf/runners/embodied_eval_runner.py + utils/metric_utils.py
compute_evaluate_metrics / print_metrics_table.
"""

import io
import contextlib

import jax
import numpy as np

from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm import init_params
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.runners.eval_runner import (
    evaluate_embodied_episodes,
    evaluate_reasoning,
    evaluate_reasoning_pass_at_k,
    pass_at_k,
    print_metrics_table,
)


def test_pass_at_k_estimator():
    # all correct / none correct
    assert pass_at_k(8, 8, 1) == 1.0
    assert pass_at_k(8, 0, 4) == 0.0
    # c=1 of n=2, k=1 -> 0.5; k=2 -> 1.0
    assert abs(pass_at_k(2, 1, 1) - 0.5) < 1e-9
    assert pass_at_k(2, 1, 2) == 1.0
    # monotone in k
    vals = [pass_at_k(16, 3, k) for k in (1, 2, 4, 8, 16)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    # matches the naive combinatorial form
    from math import comb

    naive = 1.0 - comb(16 - 3, 4) / comb(16, 4)
    assert abs(pass_at_k(16, 3, 4) - naive) < 1e-9


def _tiny_model():
    cfg = LLMConfig(
        vocab_size=258, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=128, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def test_pass_at_k_eval_runs_and_orders():
    """pass@k over a synthetic grader: pass@8 >= pass@1, metrics complete."""
    cfg, params = _tiny_model()
    tok = ByteTokenizer()
    dataset = PromptDataset(
        [PromptExample(f"q{i}:", "unused") for i in range(4)]
    )

    def coin_grader(texts, answers):
        # grade on a response property the sampler varies: ~random per sample
        return [1.0 if (len(t) and ord(t[0]) % 3 == 0) else 0.0 for t in texts]

    metrics = evaluate_reasoning_pass_at_k(
        params, cfg, tok, dataset,
        n_samples=8, ks=[1, 4, 8], temperature=1.0, max_new_tokens=8,
        reward_fn=coin_grader, batch_size=16, max_prompt_len=16,
    )
    assert set(metrics) >= {"pass@1", "pass@4", "pass@8", "num_examples"}
    assert metrics["pass@8"] >= metrics["pass@4"] >= metrics["pass@1"]
    assert metrics["num_examples"] == 4.0
    assert 0.0 <= metrics["pass@1"] <= 1.0


def test_greedy_eval_engine_reuse():
    cfg, params = _tiny_model()
    tok = ByteTokenizer()
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.rollout.engine import RolloutEngine

    sp = SamplingParams(max_new_tokens=8, greedy=True, eos_token_id=-1)
    eng = RolloutEngine(cfg, sp, prompt_bucket=16)
    dataset = PromptDataset([PromptExample("2+2=", "4")])
    r1 = evaluate_reasoning(
        params, cfg, tok, dataset, sampling=sp, batch_size=1,
        max_prompt_len=16, engine=eng,
    )
    r2 = evaluate_reasoning(
        params, cfg, tok, dataset, sampling=sp, batch_size=1,
        max_prompt_len=16, engine=eng,
    )
    # greedy + same engine => identical responses
    assert r1.per_example[0]["response"] == r2.per_example[0]["response"]
    assert r1.num_examples == 1


def test_embodied_episodic_eval():
    from rlinf_tpu.envs.toy import PointReachEnv
    from rlinf_tpu.models.embodiment import MLPGaussianPolicy

    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2)
    params = policy.init(jax.random.PRNGKey(0))
    envs = [PointReachEnv(num_envs=8, seed=0)]
    metrics = evaluate_embodied_episodes(
        envs, policy, params, num_steps=64, seed=0
    )
    assert metrics["episodes"] > 0
    assert "success_once" in metrics
    assert "episode_return_mean" in metrics
    assert metrics["episode_len_mean"] > 0


def test_print_metrics_table():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_metrics_table(
            {"pass@1": 0.25, "pass@8": 0.75}, title="reasoning", step=3
        )
    out = buf.getvalue()
    assert "pass@1" in out and "0.2500" in out and "reasoning" in out
