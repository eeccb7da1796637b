"""LLM forward parity vs HF transformers (torch CPU) + decode consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.models.llm import (
    LLMConfig,
    SamplingParams,
    forward_logits,
    generate,
    init_params,
    params_from_hf_state_dict,
    prefill,
    decode_step,
    lm_head_weight,
)


def _tiny_cfg(**kw):
    return LLMConfig.tiny(**kw)


@pytest.fixture(scope="module")
def hf_model_and_params():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=1e4, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = LLMConfig.from_hf_config(hf_cfg)
    cfg = LLMConfig(**{**cfg.__dict__, "dtype": "float32"})
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_forward_matches_hf(hf_model_and_params):
    import torch

    model, cfg, params = hf_model_and_params
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 10))

    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    ours = np.asarray(forward_logits(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_forward_matches_hf_left_padded(hf_model_and_params):
    import torch

    model, cfg, params = hf_model_and_params
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, size=(2, 12))
    mask = np.ones((2, 12), bool)
    mask[0, :4] = False  # left padding on sequence 0

    with torch.no_grad():
        hf_logits = model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    ours = np.asarray(
        forward_logits(params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    )
    # Compare only valid positions (HF emits junk at padded slots too).
    np.testing.assert_allclose(
        ours[mask], hf_logits[mask], rtol=2e-4, atol=2e-4
    )


def test_greedy_generate_matches_hf(hf_model_and_params):
    import torch

    model, cfg, params = hf_model_and_params
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 256, size=(2, 8))
    N = 6

    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(ids), max_new_tokens=N, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        ).numpy()[:, 8:]

    sp = SamplingParams(max_new_tokens=N, greedy=True, eos_token_id=-1)
    out = generate(
        params, cfg, jax.random.PRNGKey(0),
        jnp.asarray(ids), jnp.ones((2, 8), bool), sp,
    )
    np.testing.assert_array_equal(np.asarray(out.response_ids), hf_out)
    assert np.all(np.asarray(out.response_lengths) == N)


def test_greedy_generate_left_padded_matches_unpadded(hf_model_and_params):
    _, cfg, params = hf_model_and_params
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 256, size=(1, 6))
    N = 5
    sp = SamplingParams(max_new_tokens=N, greedy=True, eos_token_id=-1)

    out_plain = generate(
        params, cfg, jax.random.PRNGKey(0),
        jnp.asarray(prompt), jnp.ones((1, 6), bool), sp,
    )
    padded = np.concatenate([np.zeros((1, 3), np.int64), prompt], axis=1)
    mask = np.concatenate([np.zeros((1, 3), bool), np.ones((1, 6), bool)], axis=1)
    out_padded = generate(
        params, cfg, jax.random.PRNGKey(0),
        jnp.asarray(padded), jnp.asarray(mask), sp,
    )
    np.testing.assert_array_equal(
        np.asarray(out_plain.response_ids), np.asarray(out_padded.response_ids)
    )


def test_decode_logits_match_forward(hf_model_and_params):
    """Prefill+decode_step must reproduce full-forward logits exactly."""
    _, cfg, params = hf_model_and_params
    rng = np.random.default_rng(4)
    B, P = 2, 7
    ids = rng.integers(0, 256, size=(B, P))
    mask = jnp.ones((B, P), bool)

    full_logits = np.asarray(forward_logits(params, cfg, jnp.asarray(ids)))

    S_max = P + 2
    last_hidden, cache = prefill(params, cfg, jnp.asarray(ids), mask, S_max)
    w = lm_head_weight(params, cfg)
    prefill_logits = np.asarray(last_hidden @ w)
    np.testing.assert_allclose(
        prefill_logits, full_logits[:, -1], rtol=1e-4, atol=1e-4
    )

    # Feed one more token through decode_step; compare against a full forward
    # over the extended sequence.
    next_tok = jnp.asarray(rng.integers(0, 256, size=(B,)))
    kv_valid = jnp.pad(mask, ((0, 0), (0, 2))).at[:, P].set(True)
    hidden, _ = decode_step(
        params, cfg, next_tok, cache, P,
        jnp.full((B,), P), kv_valid,
    )
    step_logits = np.asarray(hidden @ w)

    ext_ids = jnp.concatenate([jnp.asarray(ids), next_tok[:, None]], axis=1)
    ext_logits = np.asarray(forward_logits(params, cfg, ext_ids))
    np.testing.assert_allclose(step_logits, ext_logits[:, -1], rtol=1e-4, atol=1e-4)


def test_eos_stops_generation():
    cfg = _tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    # Force eos to be the argmax everywhere by biasing the embedding-tied head:
    # instead, just pick eos = whatever greedy emits first, then check masking.
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, size=(1, 4)))
    sp0 = SamplingParams(max_new_tokens=4, greedy=True, eos_token_id=-1)
    first = generate(params, cfg, jax.random.PRNGKey(0), ids, jnp.ones((1, 4), bool), sp0)
    eos = int(np.asarray(first.response_ids)[0, 0])

    sp = SamplingParams(max_new_tokens=4, greedy=True, eos_token_id=eos, pad_token_id=0)
    out = generate(params, cfg, jax.random.PRNGKey(0), ids, jnp.ones((1, 4), bool), sp)
    assert int(out.response_lengths[0]) == 1
    mask = np.asarray(out.response_mask)[0]
    assert mask[0] and not mask[1:].any()


def test_num_params_analytic():
    cfg = LLMConfig.qwen2_0_5b()
    # Qwen2.5-0.5B is ~494M params
    assert 460e6 < cfg.num_params() < 520e6
