"""ops/: rope, rmsnorm, attention, fused logprob/entropy (+vocab-parallel)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from rlinf_tpu.ops import (
    causal_attention,
    decode_attention,
    logprobs_and_entropy_from_logits,
    rms_norm,
    vocab_parallel_logprobs_and_entropy,
)
from rlinf_tpu.ops.logprobs import fused_linear_logprobs_and_entropy
from rlinf_tpu.parallel import MeshConfig, make_mesh


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    scale = rng.normal(size=(8,)).astype(np.float32)
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(scale)))
    expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * scale
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def _np_causal_attention(q, k, v):
    B, S, H, D = q.shape
    K = k.shape[2]
    G = H // K
    out = np.zeros_like(q)
    for b in range(B):
        for h in range(H):
            kh = h // G
            scores = (q[b, :, h] @ k[b, :, kh].T) / np.sqrt(D)
            mask = np.tril(np.ones((S, S), bool))
            scores = np.where(mask, scores, -1e30)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, :, h] = p @ v[b, :, kh]
    return out


def test_causal_attention_gqa_matches_oracle():
    rng = np.random.default_rng(1)
    B, S, H, K, D = 2, 6, 4, 2, 8
    q = rng.normal(size=(B, S, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, K, D)).astype(np.float32)
    v = rng.normal(size=(B, S, K, D)).astype(np.float32)
    out = np.asarray(causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    expected = _np_causal_attention(q, k, v)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_decode_attention_matches_causal_last_position():
    rng = np.random.default_rng(2)
    B, S, H, K, D = 2, 5, 4, 2, 8
    q = rng.normal(size=(B, S, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, K, D)).astype(np.float32)
    v = rng.normal(size=(B, S, K, D)).astype(np.float32)
    full = np.asarray(causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    S_max = 8
    k_cache = np.zeros((B, S_max, K, D), np.float32)
    v_cache = np.zeros((B, S_max, K, D), np.float32)
    k_cache[:, :S] = k
    v_cache[:, :S] = v
    valid = np.zeros((B, S_max), bool)
    valid[:, :S] = True
    out = np.asarray(
        decode_attention(
            jnp.asarray(q[:, -1:]), jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.asarray(valid),
        )
    )
    np.testing.assert_allclose(out[:, 0], full[:, -1], rtol=1e-4, atol=1e-4)


def test_logprobs_and_entropy():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 4, 16)).astype(np.float32) * 3
    ids = rng.integers(0, 16, size=(2, 4))
    lp, ent = logprobs_and_entropy_from_logits(jnp.asarray(logits), jnp.asarray(ids))
    ref_lp = np.log(
        np.take_along_axis(
            np.exp(logits) / np.exp(logits).sum(-1, keepdims=True),
            ids[..., None], axis=-1,
        )[..., 0]
    )
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ref_ent = -(p * np.log(p)).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ent), ref_ent, rtol=1e-4, atol=1e-5)


def test_fused_linear_logprobs_matches_unfused():
    rng = np.random.default_rng(4)
    B, S, D, V = 2, 8, 16, 32
    hidden = rng.normal(size=(B, S, D)).astype(np.float32)
    w = rng.normal(size=(D, V)).astype(np.float32)
    ids = rng.integers(0, V, size=(B, S))

    logits = hidden @ w
    ref_lp, ref_ent = logprobs_and_entropy_from_logits(
        jnp.asarray(logits), jnp.asarray(ids)
    )
    lp, ent = fused_linear_logprobs_and_entropy(
        jnp.asarray(hidden), jnp.asarray(w), jnp.asarray(ids), chunk_size=4
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(ref_ent), rtol=1e-5, atol=1e-5)


def test_fused_linear_logprobs_grad_matches():
    rng = np.random.default_rng(5)
    B, S, D, V = 1, 4, 8, 16
    hidden = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, size=(B, S)))

    def loss_fused(h):
        lp, _ = fused_linear_logprobs_and_entropy(h, w, ids, chunk_size=2)
        return -jnp.mean(lp)

    def loss_ref(h):
        logits = jnp.einsum("bsd,dv->bsv", h, w)
        lp, _ = logprobs_and_entropy_from_logits(logits, ids)
        return -jnp.mean(lp)

    g1 = jax.grad(loss_fused)(hidden)
    g2 = jax.grad(loss_ref)(hidden)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_vocab_parallel_logprobs(devices):
    """Explicit TP logprob/entropy matches single-device over an 8-way vocab shard."""
    rng = np.random.default_rng(6)
    B, S, D, V = 2, 4, 8, 64
    hidden = rng.normal(size=(B, S, D)).astype(np.float32)
    w = rng.normal(size=(D, V)).astype(np.float32)
    ids = rng.integers(0, V, size=(B, S))

    logits = hidden @ w
    ref_lp, ref_ent = logprobs_and_entropy_from_logits(
        jnp.asarray(logits), jnp.asarray(ids)
    )

    mesh = make_mesh(MeshConfig(data=1, tensor=8))
    lp, ent = vocab_parallel_logprobs_and_entropy(
        jnp.asarray(hidden), jnp.asarray(w), jnp.asarray(ids.astype(np.int32)),
        mesh=mesh, vocab_axis="tensor",
    )
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(ref_ent), rtol=1e-4, atol=1e-5)
