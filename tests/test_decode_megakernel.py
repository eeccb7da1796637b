"""Decode megakernel vs the per-layer q8 decode path (interpret mode).

The megakernel intentionally upgrades two precisions (exact f32 current-token
attention, f32 residual stream), so tolerances are the int8-decode class.
On-chip parity at real geometry is gated by tests/tpu/test_onchip_parity.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.model import init_params
from rlinf_tpu.models.llm.quant import quantize_params
from rlinf_tpu.ops.norm import rms_norm
from rlinf_tpu.ops.pallas.decode_megakernel import (
    decode_step_mega,
    pack_decode_weights,
)
from rlinf_tpu.ops.rope import rope_frequencies


def _cfg():
    return LLMConfig(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=384, max_seq_len=128,
    )


def _mk_cache(cfg, B, S, rng):
    """Random plausible q8 packed cache, as per-layer tuples AND stacked."""
    kd = cfg.kv_dim
    layers = []
    for i in range(cfg.num_layers):
        r = np.random.default_rng(100 + i)
        k = r.integers(-80, 80, (B, S, kd)).astype(np.int8)
        v = r.integers(-80, 80, (B, S, kd)).astype(np.int8)
        ks = (r.random((B, S)) * 0.01 + 0.001).astype(np.float32)
        vs = (r.random((B, S)) * 0.01 + 0.001).astype(np.float32)
        layers.append(tuple(jnp.asarray(a) for a in (k, v, ks, vs)))
    stacked = tuple(
        jnp.stack([layer[i] for layer in layers]) for i in range(4)
    )
    return tuple(layers), stacked


def test_megakernel_matches_q8_path():
    cfg = _cfg()
    B, S = 8, 128
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params)
    plan, mw = pack_decode_weights(qparams, cfg, chunk_width=256)

    r = np.random.default_rng(0)
    tok = jnp.asarray(r.integers(0, cfg.vocab_size, (B,)), jnp.int32)
    wp = 64
    positions = jnp.full((B,), 40, jnp.int32)
    starts = jnp.asarray(r.integers(0, 8, (B,)), jnp.int32)
    lengths = jnp.full((B,), wp + 1, jnp.int32)
    layers, (kc, vc, ks, vs) = _mk_cache(cfg, B, S, r)

    # oracle: per-layer q8 decode step, XLA attention
    hidden_ref, new_layers = M.decode_step_packed_q8(
        qparams, cfg, tok, layers, jnp.int32(wp), positions, starts, lengths,
        attn_impl="xla",
    )

    x0 = qparams["embed"][tok].astype(cfg.compute_dtype)
    cos_tab, sin_tab = rope_frequencies(
        cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    try:
        hidden, kc2, vc2, ks2, vs2 = decode_step_mega(
            plan, mw, x0, kc, vc, ks, vs, jnp.int32(wp), positions, starts,
            cos_tab, sin_tab, kv_block=64, interpret=True,
        )
    except NotImplementedError as e:
        pytest.skip(f"interpret mode lacks a TPU primitive: {e}")
    hidden = rms_norm(hidden, qparams["final_norm"], cfg.rms_eps)

    a = np.asarray(hidden, np.float32)
    b = np.asarray(hidden_ref, np.float32)
    scale = max(np.abs(b).max(), 1e-6)
    assert np.abs(a - b).max() / scale < 0.05, (
        f"hidden mismatch: {np.abs(a - b).max()} vs scale {scale}")

    # cache write at slot wp: compare DEQUANTIZED k (mega quantizes the
    # exact f32 rope output, the per-layer path quantizes bf16 — codes may
    # differ by a couple of ulps)
    for li in range(cfg.num_layers):
        k_ref = (np.asarray(new_layers[li][0])[:, wp].astype(np.float32)
                 * np.asarray(new_layers[li][2])[:, wp][:, None])
        k_new = (np.asarray(kc2)[li, :, wp].astype(np.float32)
                 * np.asarray(ks2)[li, :, wp][:, None])
        tol = max(np.abs(k_ref).max(), 1e-6) * 0.03
        assert np.abs(k_ref - k_new).max() < tol, (
            f"layer {li} k cache write mismatch: "
            f"{np.abs(k_ref - k_new).max()} vs tol {tol}")
    # untouched slots preserved
    np.testing.assert_array_equal(
        np.asarray(kc2)[:, :, wp + 1:], np.asarray(kc)[:, :, wp + 1:])


def test_megakernel_ragged_write_pos():
    """Per-row write positions (continuous serving pools): mega vs the
    per-layer q8 ragged path on rows with different cache lengths."""
    cfg = _cfg()
    B, S = 8, 128
    params = init_params(cfg, jax.random.PRNGKey(4))
    qparams = quantize_params(params)
    plan, mw = pack_decode_weights(qparams, cfg, chunk_width=256)

    r = np.random.default_rng(7)
    tok = jnp.asarray(r.integers(0, cfg.vocab_size, (B,)), jnp.int32)
    wp_vec = jnp.asarray(
        r.integers(5, S - 1, (B,)), jnp.int32)           # ragged slots
    positions = wp_vec
    starts = jnp.zeros((B,), jnp.int32)
    lengths = wp_vec + 1
    layers, (kc, vc, ks, vs) = _mk_cache(cfg, B, S, r)

    hidden_ref, new_layers = M.decode_step_packed_q8(
        qparams, cfg, tok, layers, wp_vec, positions, starts, lengths,
        attn_impl="xla",
    )

    x0 = qparams["embed"][tok].astype(cfg.compute_dtype)
    cos_tab, sin_tab = rope_frequencies(
        cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta)
    try:
        hidden, kc2, vc2, ks2, vs2 = decode_step_mega(
            plan, mw, x0, kc, vc, ks, vs, wp_vec, positions, starts,
            cos_tab, sin_tab, kv_block=64, interpret=True,
        )
    except NotImplementedError as e:
        pytest.skip(f"interpret mode lacks a TPU primitive: {e}")
    hidden = rms_norm(hidden, qparams["final_norm"], cfg.rms_eps)

    a = np.asarray(hidden, np.float32)
    b = np.asarray(hidden_ref, np.float32)
    scale = max(np.abs(b).max(), 1e-6)
    assert np.abs(a - b).max() / scale < 0.05, (
        f"ragged hidden mismatch: {np.abs(a - b).max()} vs scale {scale}")

    # per-row cache writes landed at each row's own slot (dequantized)
    wp_np = np.asarray(wp_vec)
    rows = np.arange(B)
    for li in range(cfg.num_layers):
        k_ref = (np.asarray(new_layers[li][0])[rows, wp_np].astype(np.float32)
                 * np.asarray(new_layers[li][2])[rows, wp_np][:, None])
        k_new = (np.asarray(kc2)[li, rows, wp_np].astype(np.float32)
                 * np.asarray(ks2)[li, rows, wp_np][:, None])
        tol = max(np.abs(k_ref).max(), 1e-6) * 0.03
        assert np.abs(k_ref - k_new).max() < tol
        # rows' slots above their own wp untouched
        for bi in range(B):
            np.testing.assert_array_equal(
                np.asarray(kc2)[li, bi, wp_np[bi] + 1:],
                np.asarray(kc)[li, bi, wp_np[bi] + 1:])


def test_generate_mega_smoke():
    """generate(mega=...) end-to-end in interpret-friendly sizes."""
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(1))
    qparams = quantize_params(params)
    plan, mw = pack_decode_weights(qparams, cfg, chunk_width=256)
    from rlinf_tpu.models.llm import SamplingParams, generate

    r = np.random.default_rng(2)
    ids = jnp.asarray(r.integers(0, 256, (8, 16)), jnp.int32)
    mask = jnp.ones((8, 16), bool)
    sp = SamplingParams(max_new_tokens=4, greedy=True, eos_token_id=-1)
    try:
        out = generate(
            params, cfg, jax.random.PRNGKey(3), ids, mask, sp,
            decode_params=qparams, kv_quant="int8", mega=(plan, mw),
            sampler_impl="xla",
        )
    except NotImplementedError as e:
        pytest.skip(f"interpret mode lacks a TPU primitive: {e}")
    out_ref = generate(
        params, cfg, jax.random.PRNGKey(3), ids, mask, sp,
        decode_params=qparams, kv_quant="int8", sampler_impl="xla",
        decode_attn_impl="xla",
    )
    agree = (np.asarray(out.response_ids) ==
             np.asarray(out_ref.response_ids)).mean()
    assert agree > 0.9, f"mega generate greedy agreement {agree}"
