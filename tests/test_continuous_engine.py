"""Continuous-batching engine vs static engine: identical greedy outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.data.io_struct import RolloutRequest
from rlinf_tpu.models.llm import LLMConfig, SamplingParams, generate, init_params
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = LLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=256, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _static_greedy(cfg, params, prompt, sp):
    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones((1, len(prompt)), bool)
    out = generate(params, cfg, jax.random.PRNGKey(0), ids, mask, sp)
    n = int(out.response_lengths[0])
    return list(np.asarray(out.response_ids)[0, :n])


def test_continuous_matches_static_greedy(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 128, size=rng.integers(3, 20)))
               for _ in range(7)]
    sp = SamplingParams(max_new_tokens=12, greedy=True, eos_token_id=-1,
                        pad_token_id=0)

    engine = ContinuousBatchingEngine(
        cfg, sp, num_slots=3, max_seq_len=64, prompt_bucket=16, decode_chunk=4,
    )
    result = engine.generate(
        params, RolloutRequest(prompt_ids=prompts), jax.random.PRNGKey(1)
    )
    for i, prompt in enumerate(prompts):
        expected = _static_greedy(cfg, params, prompt, sp)
        n = int(result.response_lengths[i])
        got = list(result.response_ids[i, :n])
        assert got == expected, f"request {i}: {got} != {expected}"
        assert n == 12


def test_continuous_eos_frees_slots(setup):
    """With an eos the model actually emits, sequences finish at different
    lengths and slots are reused; all requests still complete."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, 128, size=5)) for _ in range(6)]
    # find a token greedy decode emits early, use it as eos
    probe = _static_greedy(
        cfg, params, prompts[0],
        SamplingParams(max_new_tokens=4, greedy=True, eos_token_id=-1),
    )
    eos = probe[1]
    sp = SamplingParams(max_new_tokens=10, greedy=True, eos_token_id=eos,
                        pad_token_id=0)
    engine = ContinuousBatchingEngine(
        cfg, sp, num_slots=2, max_seq_len=64, prompt_bucket=8, decode_chunk=3,
    )
    result = engine.generate(
        params, RolloutRequest(prompt_ids=prompts), jax.random.PRNGKey(2)
    )
    for i, prompt in enumerate(prompts):
        expected = _static_greedy(cfg, params, prompt, sp)
        n = int(result.response_lengths[i])
        assert list(result.response_ids[i, :n]) == expected, f"req {i}"


def test_continuous_long_prompt_truncation(setup):
    cfg, params = setup
    sp = SamplingParams(max_new_tokens=4, greedy=True, eos_token_id=-1)
    engine = ContinuousBatchingEngine(
        cfg, sp, num_slots=1, max_seq_len=32, prompt_bucket=8, decode_chunk=2,
    )
    long_prompt = list(range(1, 101))  # 100 tokens > 32-4 budget
    result = engine.generate(
        params, RolloutRequest(prompt_ids=[long_prompt]), jax.random.PRNGKey(0)
    )
    assert int(result.response_lengths[0]) == 4


def test_per_request_budgets():
    """RolloutRequest.max_new_tokens caps each request independently."""
    import jax
    import numpy as np

    from rlinf_tpu.data.io_struct import RolloutRequest
    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine

    cfg = LLMConfig.tiny(vocab_size=64, max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sp = SamplingParams(max_new_tokens=16, temperature=1.0, eos_token_id=-1)
    eng = ContinuousBatchingEngine(
        cfg, sp, num_slots=4, max_seq_len=64, prompt_bucket=16,
        decode_chunk=4,
    )
    req = RolloutRequest(
        prompt_ids=[[3, 4, 5]] * 6,
        answers=[""] * 6,
        max_new_tokens=[4, 8, 16, 4, 8, 16],
    )
    out = eng.rollout(params, req, jax.random.PRNGKey(1))
    lens = out.response_mask.sum(1)
    np.testing.assert_array_equal(lens, [4, 8, 16, 4, 8, 16])
    # repeat() replicates budgets
    rep = req.repeat(2)
    assert rep.max_new_tokens == [4, 4, 8, 8, 16, 16, 4, 4, 8, 8, 16, 16]


def test_kv_quant_int8_engine():
    """kv_quant='int8': the slot pool stores int8 caches + scales; rollouts
    complete and behavior logprobs stay close to the bf16-cache engine."""
    import jax
    import numpy as np

    from rlinf_tpu.data.io_struct import RolloutRequest
    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine

    cfg = LLMConfig.tiny(vocab_size=64, max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sp = SamplingParams(max_new_tokens=8, temperature=1.0, greedy=True,
                        eos_token_id=-1)
    req = RolloutRequest(prompt_ids=[[3, 4, 5, 6]] * 8, answers=[""] * 8)
    outs = {}
    for kvq in ("none", "int8"):
        eng = ContinuousBatchingEngine(
            cfg, sp, num_slots=8, max_seq_len=32, prompt_bucket=16,
            decode_chunk=4, kv_quant=kvq,
        )
        outs[kvq] = eng.rollout(params, req, jax.random.PRNGKey(1))
    a, b = outs["none"], outs["int8"]
    assert b.response_mask.sum() == a.response_mask.sum()
    # greedy tokens may diverge on near-ties; logprob magnitudes stay close
    lp_diff = np.abs(a.response_logprobs - b.response_logprobs).mean()
    assert lp_diff < 0.2, lp_diff


def test_pool_compaction_long_tail_greedy_identical():
    """Long-tail compaction (VERDICT r4 item 6): once the pending queue
    drains, the pool shrinks to a power-of-two over the live slots; greedy
    outputs are bit-identical with compaction on/off and the compacted run
    visits smaller decode shapes."""
    cfg = LLMConfig.tiny(max_seq_len=256)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sp = SamplingParams(max_new_tokens=64, greedy=True, eos_token_id=-1,
                        pad_token_id=0)
    r = np.random.default_rng(0)
    n_req = 24
    budgets = [4, 8, 12, 16, 24, 64] * 4     # ragged long tail
    prompts = [list(map(int, r.integers(2, 250, int(r.integers(4, 16)))))
               for _ in range(n_req)]
    request = RolloutRequest(
        prompt_ids=prompts, answers=[""] * n_req,
        max_new_tokens=budgets,
    )

    outs = {}
    sizes = {}
    for compact in (False, True):
        eng = ContinuousBatchingEngine(
            cfg, sp, num_slots=32, max_seq_len=256, prompt_bucket=16,
            decode_chunk=4, compact=compact,
        )
        seen = []
        orig = eng.decode_and_harvest

        def spy(pool, dparams, rng, _orig=orig, _seen=seen):
            _seen.append(pool.size)
            return _orig(pool, dparams, rng)

        eng.decode_and_harvest = spy
        outs[compact] = eng.rollout(params, request, jax.random.PRNGKey(7))
        sizes[compact] = seen

    assert min(sizes[True]) < 32, sizes[True]       # pool actually shrank
    assert set(sizes[False]) == {32}
    a, b = outs[False], outs[True]
    np.testing.assert_array_equal(
        np.asarray(a.response_ids), np.asarray(b.response_ids))
    np.testing.assert_array_equal(
        np.asarray(a.response_lengths), np.asarray(b.response_lengths))
    # budgets respected
    assert all(
        int(l) <= bud
        for l, bud in zip(np.asarray(a.response_lengths), budgets)
    )


def test_mega_engine_matches_q8_engine():
    """use_mega=True: whole-step megakernel decode with per-row ragged
    write positions inside the slot pool (interpret mode on CPU). Greedy
    outputs agree with the per-layer q8 engine up to the kernel's
    deliberate precision upgrades; budgets + compaction still hold."""
    cfg = LLMConfig.tiny(vocab_size=64, max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sp = SamplingParams(max_new_tokens=16, greedy=True, eos_token_id=-1,
                        pad_token_id=0)
    r = np.random.default_rng(3)
    n_req = 8
    budgets = [4, 4, 8, 8, 12, 16, 16, 16]          # ragged write positions
    prompts = [list(map(int, r.integers(2, 60, int(r.integers(3, 10)))))
               for _ in range(n_req)]
    request = RolloutRequest(
        prompt_ids=prompts, answers=[""] * n_req, max_new_tokens=budgets,
    )

    outs = {}
    for mega in (False, True, "auto"):
        eng = ContinuousBatchingEngine(
            cfg, sp, num_slots=16, max_seq_len=128, prompt_bucket=16,
            decode_chunk=4, weight_quant="int8", kv_quant="int8",
            decode_attn_impl="xla", use_mega=mega, mega_chunk_width=128,
            # "auto": start per-layer (16 > 8), switch to mega when
            # compaction shrinks the pool — exercises the hybrid relayout
            mega_threshold=8,
        )
        if mega == "auto":
            seen = []
            orig = eng.decode_and_harvest

            def spy(pool, dp, rng, _o=orig, _s=seen):
                _s.append(ContinuousBatchingEngine._is_stacked(pool.kv_layers))
                return _o(pool, dp, rng)

            eng.decode_and_harvest = spy
        outs[mega] = eng.rollout(params, request, jax.random.PRNGKey(5))
    assert False in seen and True in seen, (
        f"hybrid never switched layouts: {seen}")

    a = outs[False]
    la = np.asarray(a.response_lengths)
    for key in (True, "auto"):
        b = outs[key]
        lb = np.asarray(b.response_lengths)
        np.testing.assert_array_equal(la, lb)       # budget-driven lengths
        assert all(int(l) <= bud for l, bud in zip(lb, budgets))
        # greedy tokens: near-tie flips allowed, bulk agreement required
        ta = np.asarray(a.response_ids)
        tb = np.asarray(b.response_ids)
        agree = (ta == tb)[np.asarray(a.response_mask)].mean()
        assert agree > 0.85, f"mega={key} engine greedy agreement {agree}"
