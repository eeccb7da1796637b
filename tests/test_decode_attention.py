"""Parity tests for the packed-layout Pallas decode attention kernel.

Runs the kernel in interpret mode on CPU against the XLA reference with
identical semantics (`decode_attention_packed_xla`). Covers the GQA packed
layout, multi-row blocking (`block_rows`), ragged valid intervals
[start, length) incl. empty rows, and block sizes that partition the cache.

Reference analog: SGLang/FlashInfer decode kernels (SURVEY.md §2.9) — here
the numerics oracle is the in-repo XLA formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.ops.pallas.decode_attention import (
    decode_attention_packed,
    decode_attention_packed_xla,
)


def _mk(B, H, Kv, Hd, S, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, Hd)), dtype)
    k = jnp.asarray(rng.normal(size=(B, S, Kv * Hd)), dtype)
    v = jnp.asarray(rng.normal(size=(B, S, Kv * Hd)), dtype)
    return q, k, v


def _assert_parity(q, k, v, starts, lengths, num_kv, **kw):
    got = decode_attention_packed(
        q, k, v, starts, lengths, num_kv=num_kv, interpret=True, **kw
    )
    want = decode_attention_packed_xla(
        q, k, v, starts, lengths, num_kv=num_kv
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=2e-3, atol=2e-3,
    )


@pytest.mark.parametrize("block_rows", [1, 2, 4, 8])
def test_multirow_parity_gqa(block_rows):
    # Qwen2-0.5B-like GQA: 14 q heads, 2 kv heads, head_dim 64.
    B, H, Kv, Hd, S = 8, 14, 2, 64, 512
    q, k, v = _mk(B, H, Kv, Hd, S)
    rng = np.random.default_rng(1)
    starts = jnp.asarray(rng.integers(0, S // 2, B), jnp.int32)
    lengths = jnp.asarray(rng.integers(S // 2, S + 1, B), jnp.int32)
    _assert_parity(q, k, v, starts, lengths, Kv,
                   block_size=128, block_rows=block_rows)


def test_mha_full_interval():
    B, H, Kv, Hd, S = 4, 8, 8, 64, 256
    q, k, v = _mk(B, H, Kv, Hd, S, seed=2)
    starts = jnp.zeros(B, jnp.int32)
    lengths = jnp.full(B, S, jnp.int32)
    _assert_parity(q, k, v, starts, lengths, Kv, block_size=128)


def test_empty_rows_zero_output():
    B, H, Kv, Hd, S = 8, 4, 2, 64, 256
    q, k, v = _mk(B, H, Kv, Hd, S, seed=3)
    starts = jnp.asarray([0, 5, 0, 0, 7, 0, 0, 0], jnp.int32)
    # Rows 1 and 4: empty interval (start >= length) -> zero output.
    lengths = jnp.asarray([256, 5, 100, 1, 3, 256, 17, 128], jnp.int32)
    got = decode_attention_packed(
        q, k, v, starts, lengths, num_kv=Kv, interpret=True,
        block_size=128, block_rows=4,
    )
    np.testing.assert_allclose(np.asarray(got[1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[4]), 0.0, atol=1e-6)
    _assert_parity(q, k, v, starts, lengths, Kv,
                   block_size=128, block_rows=4)


def test_odd_batch_falls_back_to_row1():
    # B not divisible by block_rows: implementation halves block_rows to fit.
    B, H, Kv, Hd, S = 3, 4, 2, 64, 256
    q, k, v = _mk(B, H, Kv, Hd, S, seed=4)
    starts = jnp.asarray([0, 10, 100], jnp.int32)
    lengths = jnp.asarray([256, 200, 130], jnp.int32)
    _assert_parity(q, k, v, starts, lengths, Kv,
                   block_size=64, block_rows=8)


def test_single_block_whole_cache():
    B, H, Kv, Hd, S = 8, 14, 2, 64, 128
    q, k, v = _mk(B, H, Kv, Hd, S, seed=5)
    rng = np.random.default_rng(6)
    starts = jnp.asarray(rng.integers(0, 64, B), jnp.int32)
    lengths = jnp.asarray(rng.integers(65, S + 1, B), jnp.int32)
    _assert_parity(q, k, v, starts, lengths, Kv,
                   block_size=S, block_rows=8)


def test_bf16_inputs():
    B, H, Kv, Hd, S = 4, 14, 2, 64, 256
    q, k, v = _mk(B, H, Kv, Hd, S, seed=7, dtype=jnp.bfloat16)
    starts = jnp.zeros(B, jnp.int32)
    lengths = jnp.asarray([256, 93, 128, 17], jnp.int32)
    got = decode_attention_packed(
        q, k, v, starts, lengths, num_kv=Kv, interpret=True,
        block_size=128, block_rows=4,
    )
    want = decode_attention_packed_xla(
        q, k, v, starts, lengths, num_kv=Kv
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_q8_kernel_matches_oracle():
    """int8-KV kernel vs its dequantize-then-reference oracle (exact
    semantics: both consume the same quantized cache)."""
    import functools
    from rlinf_tpu.ops.pallas.decode_attention import (
        decode_attention_packed_q8, decode_attention_packed_q8_xla,
        quantize_kv_token,
    )

    for B, S, H, Kv, Hd, blk in [(8, 128, 4, 2, 64, 256),
                                 (16, 256, 8, 4, 32, 64)]:
        KD = Kv * Hd
        ks = jax.random.split(jax.random.PRNGKey(B), 3)
        q = jax.random.normal(ks[0], (B, H, Hd), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, KD), jnp.float32) * 0.3
        v = jax.random.normal(ks[2], (B, S, KD), jnp.float32) * 0.3
        kq, kscale = quantize_kv_token(k)
        vq, vscale = quantize_kv_token(v)
        starts = jnp.zeros((B,), jnp.int32)
        lengths = (jnp.arange(B, dtype=jnp.int32) * 7) % (S - 4) + 3
        a = decode_attention_packed_q8(
            q, kq, vq, kscale, vscale, starts, lengths, num_kv=Kv,
            block_size=blk, interpret=True)
        b = decode_attention_packed_q8_xla(
            q, kq, vq, kscale, vscale, starts, lengths, num_kv=Kv)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_q8_quantization_error_bounded():
    """q8 vs exact bf16 attention: per-token max-abs int8 keeps the output
    within ~1% relative."""
    from rlinf_tpu.ops.pallas.decode_attention import (
        decode_attention_packed_q8_xla, decode_attention_packed_xla,
        quantize_kv_token,
    )

    B, S, H, Kv, Hd = 8, 64, 4, 2, 32
    KD = Kv * Hd
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, Hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, KD), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, S, KD), jnp.float32) * 0.5
    kq, kscale = quantize_kv_token(k)
    vq, vscale = quantize_kv_token(v)
    starts = jnp.zeros((B,), jnp.int32)
    lengths = jnp.full((B,), S, jnp.int32)
    exact = decode_attention_packed_xla(q, k, v, starts, lengths, num_kv=Kv)
    quant = decode_attention_packed_q8_xla(
        q, kq, vq, kscale, vscale, starts, lengths, num_kv=Kv)
    err = float(np.abs(np.asarray(exact) - np.asarray(quant)).max())
    scale = float(np.abs(np.asarray(exact)).max())
    assert err < 0.03 * scale, (err, scale)


def test_q8_decode_step_matches_bf16():
    """decode_step_packed_q8 (quantize-on-write int8 cache) stays close to
    the exact-cache decode step at the hidden-state level."""
    from rlinf_tpu.models.llm.model import (
        LLMConfig, decode_step_packed, decode_step_packed_q8,
        init_kv_cache_packed, init_kv_cache_packed_q8, init_params,
    )

    cfg = LLMConfig(vocab_size=64, hidden_size=64, num_layers=2, num_heads=4,
                    num_kv_heads=2, head_dim=16, intermediate_size=96,
                    max_seq_len=64, dtype="float32")
    p = init_params(cfg, jax.random.PRNGKey(0))
    B, S = 4, 32
    toks = jnp.arange(B) + 3
    wp = jnp.arange(B, dtype=jnp.int32)
    starts = jnp.zeros((B,), jnp.int32)
    h8, c8 = decode_step_packed_q8(
        p, cfg, toks, init_kv_cache_packed_q8(cfg, B, S), wp, wp, starts,
        wp + 1, attn_impl="xla")
    h, _ = decode_step_packed(
        p, cfg, toks, init_kv_cache_packed(cfg, B, S), wp, wp, starts,
        wp + 1, attn_impl="xla")
    err = float(np.abs(np.asarray(h8, np.float32)
                       - np.asarray(h, np.float32)).max())
    assert err < 0.05, err
    # cache holds int8 values + f32 scales
    kc, vc, ks, vs = c8[0]
    assert kc.dtype == jnp.int8 and ks.dtype == jnp.float32
