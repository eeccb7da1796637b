"""Pallas flash attention vs XLA reference: forward + gradients, masks, GQA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlinf_tpu.ops.attention import causal_attention
from rlinf_tpu.ops.pallas.flash_attention import flash_attention


def _rand_qkv(rng, B, Sq, Sk, H, K, D):
    q = rng.normal(size=(B, Sq, H, D)).astype(np.float32)
    k = rng.normal(size=(B, Sk, K, D)).astype(np.float32)
    v = rng.normal(size=(B, Sk, K, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("H,K", [(4, 4), (4, 2), (8, 2)])
def test_flash_forward_matches_xla(H, K):
    rng = np.random.default_rng(0)
    B, S, D = 2, 64, 16
    q, k, v = _rand_qkv(rng, B, S, S, H, K, D)
    ref = causal_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_forward_left_padding():
    rng = np.random.default_rng(1)
    B, S, H, K, D = 2, 32, 4, 2, 8
    q, k, v = _rand_qkv(rng, B, S, S, H, K, D)
    mask = np.ones((B, S), bool)
    mask[0, :10] = False  # left padding
    positions = np.maximum(np.cumsum(mask, axis=1) - 1, 0)

    ref = causal_attention(
        q, k, v,
        positions_q=jnp.asarray(positions), positions_kv=jnp.asarray(positions),
        kv_valid_mask=jnp.asarray(mask),
    )
    out = flash_attention(
        q, k, v,
        positions_q=jnp.asarray(positions), positions_kv=jnp.asarray(positions),
        kv_valid_mask=jnp.asarray(mask), block_q=16, block_k=16,
    )
    # compare at valid positions only
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out)[m], np.asarray(ref)[m], rtol=2e-4, atol=2e-4
    )


def test_flash_non_divisible_seq_pads():
    rng = np.random.default_rng(2)
    B, S, H, K, D = 1, 50, 2, 2, 8  # 50 not divisible by 16
    q, k, v = _rand_qkv(rng, B, S, S, H, K, D)
    ref = causal_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("H,K", [(4, 2)])
def test_flash_gradients_match_xla(H, K):
    rng = np.random.default_rng(3)
    B, S, D = 2, 32, 8
    q, k, v = _rand_qkv(rng, B, S, S, H, K, D)
    mask = np.ones((B, S), bool)
    mask[1, :5] = False
    positions = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    pq = jnp.asarray(positions)
    vm = jnp.asarray(mask)
    cot = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))

    def loss_ref(q, k, v):
        out = causal_attention(
            q, k, v, positions_q=pq, positions_kv=pq, kv_valid_mask=vm
        )
        return jnp.sum(out * cot * vm[:, :, None, None])

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, positions_q=pq, positions_kv=pq, kv_valid_mask=vm,
            block_q=16, block_k=16,
        )
        return jnp.sum(out * cot * vm[:, :, None, None])

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        # padded-query rows produce garbage grads in both impls; mask them
        if name == "q":
            a = a * mask[:, :, None, None]
            b = b * mask[:, :, None, None]
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4, err_msg=f"d{name}")


def test_flash_in_model_forward():
    """attn_impl='pallas' path through the full model matches XLA."""
    from rlinf_tpu.models.llm import LLMConfig, forward_logits, init_params

    cfg = LLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, max_seq_len=64, dtype="float32",
        qkv_bias=True, rope_theta=1e4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 128, (2, 48)))
    ref = forward_logits(params, cfg, ids, attn_impl="xla")
    out = forward_logits(params, cfg, ids, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4)
