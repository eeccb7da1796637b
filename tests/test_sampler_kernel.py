"""Fused lm-head sampling kernel vs the XLA sampler (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.models.llm.quant import quantize_tensor
from rlinf_tpu.models.llm.sampler import SamplingParams, sample_from_logits
from rlinf_tpu.ops.pallas.sampler_kernel import fused_lmhead_sample


def _setup(B=8, D=128, V=1000, seed=0):
    r = np.random.default_rng(seed)
    h = jnp.asarray(r.normal(size=(B, D)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(r.normal(size=(D, V)) * 0.05, jnp.float32)
    q = quantize_tensor(w)
    # oracle logits exactly as the kernel computes them: int8 -> f32 matmul
    logits = (
        h.astype(jnp.float32) @ q.q.astype(jnp.float32)
    ) * q.scale.reshape(1, -1)
    return h, q, logits


def test_greedy_matches_argmax():
    h, q, logits = _setup()
    tok, lp = fused_lmhead_sample(
        h, q.q, q.scale, jnp.int32(7), greedy=True, interpret=True
    )
    tok_ref = jnp.argmax(logits, axis=-1)
    lse = jax.nn.logsumexp(logits, axis=-1)
    lp_ref = jnp.take_along_axis(logits, tok_ref[:, None], 1)[:, 0] - lse
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok_ref))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)


def test_sampled_logprob_is_correct_for_token():
    """Whatever token the kernel samples, its reported logprob must equal
    the temperature-softmax logprob of that token."""
    h, q, logits = _setup(seed=1)
    T = 0.7
    try:
        tok, lp = fused_lmhead_sample(
            h, q.q, q.scale, jnp.int32(123), temperature=T, interpret=True
        )
    except NotImplementedError:
        pytest.skip("interpret mode lacks TPU PRNG; covered on-chip")
    scaled = logits / T
    lse = jax.nn.logsumexp(scaled, axis=-1)
    lp_ref = (
        jnp.take_along_axis(scaled, np.asarray(tok)[:, None], 1)[:, 0] - lse
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(tok) >= 0).all() and (np.asarray(tok) < 1000).all()


def test_sampled_distribution_tracks_softmax():
    """Empirical frequency over many seeds ~ softmax on a tiny sharp vocab."""
    B, D, V = 4, 128, 128
    r = np.random.default_rng(3)
    h = jnp.asarray(r.normal(size=(B, D)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(r.normal(size=(D, V)) * 0.2, jnp.float32)
    q = quantize_tensor(w)
    logits = (
        h.astype(jnp.float32) @ q.q.astype(jnp.float32)
    ) * q.scale.reshape(1, -1)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))

    counts = np.zeros((B, V))
    n_draws = 300
    for s in range(n_draws):
        try:
            tok, _ = fused_lmhead_sample(
                h, q.q, q.scale, jnp.int32(s * 97 + 5), interpret=True
            )
        except NotImplementedError:
            pytest.skip("interpret mode lacks TPU PRNG; covered on-chip")
        for b, t in enumerate(np.asarray(tok)):
            counts[b, t] += 1
    freq = counts / n_draws
    # top-prob token frequency within ~4 sigma of its softmax probability
    for b in range(B):
        top = probs[b].argmax()
        p = probs[b, top]
        sigma = np.sqrt(p * (1 - p) / n_draws)
        assert abs(freq[b, top] - p) < 4 * sigma + 0.02, (
            b, p, freq[b, top])


def test_vocab_pad_path():
    h, q, logits = _setup(V=1000)  # 1000 % 1024 != 0 -> pad path
    tok, _ = fused_lmhead_sample(
        h, q.q, q.scale, jnp.int32(3), greedy=True, interpret=True,
        vt_size=256,
    )
    assert (np.asarray(tok) < 1000).all()


def test_generate_fused_dispatch_cpu_smoke():
    """generate(sampler_impl='fused') runs end-to-end (interpret off-TPU is
    not exercised here — CPU uses the XLA path by default; force-fused is
    checked on-chip by the parity gate)."""
    from rlinf_tpu.models.llm import LLMConfig, generate, init_params

    cfg = LLMConfig(
        vocab_size=256, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=32, intermediate_size=256, max_seq_len=128,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, 256, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), bool)
    sp = SamplingParams(max_new_tokens=8, eos_token_id=-1)
    out = generate(params, cfg, jax.random.PRNGKey(1), ids, mask, sp)
    assert out.response_ids.shape == (4, 8)
