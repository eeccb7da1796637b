"""int8 weight-only rollout quantization (models/llm/quant.py).

Covers: QTensor round-trip accuracy, quant-aware matmul dispatch in the
model forward, and generate() with int8 decode params producing sensible
(low-divergence) behavior vs the bf16 decode path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.models.llm import (
    LLMConfig,
    SamplingParams,
    generate,
    init_params,
    quantize_params,
)
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.quant import QTensor, dequantize, mm, quantize_tensor


def test_quantize_tensor_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 0.05, jnp.float32)
    q = quantize_tensor(w)
    assert q.q.dtype == jnp.int8
    assert q.scale.shape == (1, 128)
    back = dequantize(q, jnp.float32)
    # per-channel int8: error bounded by scale/2 per element
    assert float(jnp.max(jnp.abs(back - w))) < float(jnp.max(q.scale)) * 0.51


def test_mm_dispatch_matches_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    dense = mm(x, w)
    quant = mm(x, quantize_tensor(w))
    rel = float(jnp.linalg.norm(quant - dense) / jnp.linalg.norm(dense))
    assert rel < 0.01, rel


def test_quantize_params_structure():
    cfg = LLMConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params)
    # fused decode weights: wq/wk/wv -> wqkv, gate/up -> wgu (one matmul
    # dispatch each; per-output-channel scales make the fusion exact)
    assert isinstance(qp["blocks"]["wqkv"], QTensor)
    assert isinstance(qp["blocks"]["wgu"], QTensor)
    assert "wq" not in qp["blocks"] and "gate" not in qp["blocks"]
    assert isinstance(qp["lm_head"], QTensor)          # tied -> materialized
    assert not isinstance(qp["blocks"]["attn_norm"], QTensor)
    assert not isinstance(qp["embed"], QTensor)        # gather stays bf16
    # stacked [L, D, F] weights: per (layer, out-channel) scales
    assert qp["blocks"]["wqkv"].scale.shape == (
        cfg.num_layers, 1, cfg.q_dim + 2 * cfg.kv_dim
    )
    # unfused mode keeps the original layout
    qp_uf = quantize_params(params, fuse=False)
    assert isinstance(qp_uf["blocks"]["wq"], QTensor)
    assert qp_uf["blocks"]["wq"].scale.shape == (
        cfg.num_layers, 1, cfg.q_dim
    )


def test_forward_logits_with_quantized_params():
    cfg = LLMConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (2, 16)), jnp.int32
    )
    dense = M.forward_logits(params, cfg, ids)
    quant = M.forward_logits(qp, cfg, ids)
    # logit agreement: int8 weight-only keeps logits close on a tiny model
    rel = float(
        jnp.linalg.norm(quant - dense) / jnp.maximum(jnp.linalg.norm(dense), 1e-6)
    )
    assert rel < 0.05, rel


def test_generate_with_int8_decode_params():
    cfg = LLMConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params)
    rng = jax.random.PRNGKey(3)
    r = np.random.default_rng(4)
    ids = jnp.asarray(r.integers(1, cfg.vocab_size, (4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), bool)
    sp = SamplingParams(max_new_tokens=8, greedy=True, eos_token_id=-1)

    out_bf16 = generate(params, cfg, rng, ids, mask, sp)
    out_int8 = generate(params, cfg, rng, ids, mask, sp, decode_params=qp)
    assert out_int8.response_ids.shape == out_bf16.response_ids.shape
    # Greedy decode from identical state: the quantized policy should agree
    # on the vast majority of steps at tiny scale (it is the same argmax up
    # to ~1% logit perturbation).
    agree = float(
        jnp.mean((out_int8.response_ids == out_bf16.response_ids).astype(jnp.float32))
    )
    assert agree > 0.7, agree
    assert bool(jnp.all(jnp.isfinite(out_int8.response_logprobs)))


def test_generate_int8_kv_cache_matches_bf16():
    """Static generate with kv_quant=int8 (quantize-on-write cache,
    decode_step_packed_q8): greedy tokens match the bf16-cache path and
    behavior logprobs stay close on a tiny model."""
    cfg = LLMConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    import numpy as np

    from rlinf_tpu.models.llm import SamplingParams, generate

    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), bool)
    sp = SamplingParams(max_new_tokens=8, greedy=True, eos_token_id=-1)
    a = generate(params, cfg, jax.random.PRNGKey(1), ids, mask, sp)
    b = generate(params, cfg, jax.random.PRNGKey(1), ids, mask, sp,
                 kv_quant="int8")
    assert (np.asarray(a.response_ids) == np.asarray(b.response_ids)).all()
    lp_err = np.max(np.abs(
        np.asarray(a.response_logprobs) - np.asarray(b.response_logprobs)))
    assert lp_err < 0.05, lp_err
