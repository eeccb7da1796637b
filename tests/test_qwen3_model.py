"""Qwen3-family parity: qk-norm decoder vs HF transformers (forward + greedy
decode + state-dict round trip). Extends the Qwen2 parity suite
(test_llm_model.py) to the Qwen3 geometry the reference benchmarks with
(SURVEY.md §6 Qwen3-30B-A3B MoE GRPO)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.models.llm import LLMConfig, SamplingParams, generate, init_params
from rlinf_tpu.models.llm.hf_import import (
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)
from rlinf_tpu.models.llm.model import forward_logits


@pytest.fixture(scope="module")
def qwen3_model_and_params():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=1e4,
        rms_norm_eps=1e-6, tie_word_embeddings=True, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = LLMConfig.from_hf_config(hf_cfg)
    assert cfg.qk_norm and not cfg.qkv_bias
    cfg = LLMConfig(**{**cfg.__dict__, "dtype": "float32"})
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_qwen3_forward_matches_hf(qwen3_model_and_params):
    import torch

    model, cfg, params = qwen3_model_and_params
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 12))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(forward_logits(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_qwen3_greedy_generate_matches_hf(qwen3_model_and_params):
    import torch

    model, cfg, params = qwen3_model_and_params
    rng = np.random.default_rng(1)
    P, N = 8, 10
    ids = rng.integers(0, 256, size=(2, P))
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(ids), max_new_tokens=N, do_sample=False,
            pad_token_id=0).numpy()[:, P:]
    sp = SamplingParams(max_new_tokens=N, greedy=True, eos_token_id=-1,
                        pad_token_id=0)
    out = generate(params, cfg, jax.random.PRNGKey(0), jnp.asarray(ids),
                   jnp.ones((2, P), bool), sp)
    np.testing.assert_array_equal(np.asarray(out.response_ids), hf_out)


def test_qwen3_state_dict_roundtrip(qwen3_model_and_params):
    _, cfg, params = qwen3_model_and_params
    sd = params_to_hf_state_dict(params, cfg)
    assert "model.layers.0.self_attn.q_norm.weight" in sd
    params2 = params_from_hf_state_dict(sd, cfg)
    for k in ("q_norm", "k_norm", "wq"):
        np.testing.assert_allclose(
            np.asarray(params["blocks"][k]),
            np.asarray(params2["blocks"][k]), rtol=1e-6)


def test_qwen3_presets_param_counts():
    # published sizes: Qwen3-0.6B ≈ 0.6e9, Qwen3-1.7B ≈ 1.7e9 (incl. embeddings)
    assert 0.5e9 < LLMConfig.qwen3_0_6b().num_params() < 0.8e9
    assert 1.4e9 < LLMConfig.qwen3_1_7b().num_params() < 2.1e9
    moe = LLMConfig.qwen3_moe_30b_a3b()
    assert moe.is_moe and moe.qk_norm


def test_qwen3_random_init_runs():
    cfg = LLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=16, qkv_bias=False,
        qk_norm=True, dtype="float32", max_seq_len=64, rope_theta=1e4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert params["blocks"]["q_norm"].shape == (2, 16)
    logits = forward_logits(params, cfg, jnp.zeros((1, 4), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
