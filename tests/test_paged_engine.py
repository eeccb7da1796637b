"""Paged continuous-batching engine: greedy outputs bit-identical to the
dense continuous engine (itself bit-identical to the static engine), page
accounting, and EOS slot/page reuse."""

import numpy as np
import jax
import pytest

from rlinf_tpu.data.io_struct import RolloutRequest
from rlinf_tpu.models.llm import LLMConfig, SamplingParams, init_params
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine
from rlinf_tpu.rollout.paged_engine import PagedContinuousEngine


@pytest.fixture(scope="module")
def setup():
    cfg = LLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, max_seq_len=256, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_paged_matches_dense_continuous_greedy(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 128, size=rng.integers(3, 30)))
               for _ in range(7)]
    sp = SamplingParams(max_new_tokens=12, greedy=True, eos_token_id=-1,
                        pad_token_id=0)

    dense = ContinuousBatchingEngine(
        cfg, sp, num_slots=3, max_seq_len=64, prompt_bucket=16, decode_chunk=4,
    )
    ref = dense.generate(
        params, RolloutRequest(prompt_ids=prompts), jax.random.PRNGKey(1)
    )
    paged = PagedContinuousEngine(
        cfg, sp, num_slots=3, max_seq_len=64, prompt_bucket=16,
        decode_chunk=4, page_size=8,
    )
    got = paged.generate(
        params, RolloutRequest(prompt_ids=prompts), jax.random.PRNGKey(1)
    )
    for i in range(len(prompts)):
        n_ref = int(ref.response_lengths[i])
        n_got = int(got.response_lengths[i])
        assert n_got == n_ref
        assert list(got.response_ids[i, :n_got]) == list(
            ref.response_ids[i, :n_ref]
        ), f"request {i} diverged"
        np.testing.assert_allclose(
            got.response_logprobs[i, :n_got],
            ref.response_logprobs[i, :n_ref], rtol=1e-4, atol=1e-5,
        )


def test_paged_eos_reuses_pages(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, 128, size=6)) for _ in range(6)]
    sp0 = SamplingParams(max_new_tokens=8, greedy=True, eos_token_id=-1,
                         pad_token_id=0)
    probe = ContinuousBatchingEngine(
        cfg, sp0, num_slots=2, max_seq_len=64, prompt_bucket=16,
        decode_chunk=4,
    ).generate(params, RolloutRequest(prompt_ids=prompts[:1]),
               jax.random.PRNGKey(0))
    eos = int(probe.response_ids[0, 3])  # token greedy decode emits early

    sp = SamplingParams(max_new_tokens=8, greedy=True, eos_token_id=eos,
                        pad_token_id=0)
    # tight pool: enough for 2 concurrent slots only -> forces page reuse
    engine = PagedContinuousEngine(
        cfg, sp, num_slots=2, max_seq_len=32, prompt_bucket=16,
        decode_chunk=4, page_size=8, num_pages=1 + 2 * 4,
    )
    out = engine.generate(
        params, RolloutRequest(prompt_ids=prompts), jax.random.PRNGKey(1)
    )
    dense = ContinuousBatchingEngine(
        cfg, sp, num_slots=2, max_seq_len=32, prompt_bucket=16, decode_chunk=4,
    ).generate(params, RolloutRequest(prompt_ids=prompts), jax.random.PRNGKey(1))
    for i in range(len(prompts)):
        n = int(out.response_lengths[i])
        assert n == int(dense.response_lengths[i])
        assert list(out.response_ids[i, :n]) == list(dense.response_ids[i, :n])
