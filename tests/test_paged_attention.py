"""Paged decode attention: Pallas kernel (interpret mode) vs XLA oracle,
page-pool allocator invariants, and cache-write round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.ops.attention import decode_attention
from rlinf_tpu.ops.pallas.paged_attention import (
    paged_attention,
    paged_attention_xla,
)
from rlinf_tpu.rollout.paged_cache import (
    PagePool,
    init_page_pool_cache,
    paged_cache_write,
)


def _random_paged_case(B=4, H=8, Kv=2, Hd=32, P=16, max_pages=4, seed=0):
    rng = np.random.default_rng(seed)
    num_pages = B * max_pages + 1
    q = jnp.asarray(rng.normal(size=(B, H, Hd)), jnp.float32)
    k_pages = jnp.asarray(rng.normal(size=(num_pages, Kv, P, Hd)), jnp.float32)
    v_pages = jnp.asarray(rng.normal(size=(num_pages, Kv, P, Hd)), jnp.float32)
    # distinct pages per slot, ragged lengths
    table = np.zeros((B, max_pages), np.int32)
    lengths = np.zeros((B,), np.int32)
    next_page = 1
    for b in range(B):
        lengths[b] = rng.integers(1, max_pages * P + 1)
        for j in range(-(-int(lengths[b]) // P)):
            table[b, j] = next_page
            next_page += 1
    return q, k_pages, v_pages, jnp.asarray(table), jnp.asarray(lengths)


def test_paged_kernel_matches_xla_oracle():
    q, k_pages, v_pages, table, lengths = _random_paged_case()
    ref = paged_attention_xla(q, k_pages, v_pages, table, lengths)
    out = paged_attention(q, k_pages, v_pages, table, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_paged_kernel_gqa_and_single_token():
    # lengths=1 exercises the single-page, nearly-all-masked path
    q, k_pages, v_pages, table, _ = _random_paged_case(B=2, H=6, Kv=3, seed=1)
    lengths = jnp.array([1, 5], jnp.int32)
    ref = paged_attention_xla(q, k_pages, v_pages, table, lengths)
    out = paged_attention(q, k_pages, v_pages, table, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_paged_xla_matches_dense_decode():
    """The oracle itself must equal dense decode attention on an equivalent
    contiguous cache."""
    B, H, Kv, Hd, P, max_pages = 2, 4, 2, 16, 8, 3
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, H, Hd)), jnp.float32)
    dense_k = jnp.asarray(rng.normal(size=(B, max_pages * P, Kv, Hd)), jnp.float32)
    dense_v = jnp.asarray(rng.normal(size=(B, max_pages * P, Kv, Hd)), jnp.float32)
    lengths = jnp.array([5, 20], jnp.int32)
    # scatter dense rows into pages
    num_pages = B * max_pages + 1
    k_pages = np.zeros((num_pages, Kv, P, Hd), np.float32)
    v_pages = np.zeros((num_pages, Kv, P, Hd), np.float32)
    table = np.zeros((B, max_pages), np.int32)
    pid = 1
    for b in range(B):
        for j in range(max_pages):
            table[b, j] = pid
            k_pages[pid] = np.asarray(dense_k[b, j * P:(j + 1) * P]).transpose(1, 0, 2)
            v_pages[pid] = np.asarray(dense_v[b, j * P:(j + 1) * P]).transpose(1, 0, 2)
            pid += 1
    valid = jnp.arange(max_pages * P)[None] < lengths[:, None]
    ref = decode_attention(q[:, None], dense_k, dense_v, valid)[:, 0]
    out = paged_attention_xla(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(table), lengths,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# allocator
# ---------------------------------------------------------------------------

def test_page_pool_alloc_append_free():
    pool = PagePool(num_pages=8, page_size=4, num_slots=2, max_pages_per_slot=3)
    assert pool.free_pages == 7  # page 0 reserved
    pool.alloc_slot(0, tokens=5)  # 2 pages
    assert pool.free_pages == 5 and pool.lengths[0] == 5
    # appends within page 2 until boundary
    for i in range(3):
        pid, off = pool.append_token(0)
        assert off == (5 + i) % 4
    assert pool.free_pages == 5  # still page 2 (positions 5..7)
    pid, off = pool.append_token(0)  # position 8 -> new page
    assert off == 0 and pool.free_pages == 4
    used_pages = set(pool.page_table[0, :3].tolist())
    pool.free_slot(0)
    assert pool.free_pages == 7
    assert (pool.page_table[0] == 0).all() and pool.lengths[0] == 0
    # freed pages are reusable
    pool.alloc_slot(1, tokens=12)
    assert set(pool.page_table[1].tolist()) & used_pages


def test_page_pool_exhaustion():
    pool = PagePool(num_pages=3, page_size=4, num_slots=2, max_pages_per_slot=2)
    pool.alloc_slot(0, tokens=8)
    with pytest.raises(MemoryError):
        pool.alloc_slot(1, tokens=4)
    assert not pool.can_alloc(4)


def test_paged_cache_write_roundtrip():
    k_pages, v_pages = init_page_pool_cache(
        num_layers=1, num_pages=4, page_size=4, num_kv_heads=2, head_dim=8,
        dtype=jnp.float32,
    )
    k_new = jnp.ones((2, 2, 8), jnp.float32) * jnp.array([[[1.0]], [[2.0]]])
    v_new = -k_new
    page_ids = jnp.array([1, 3])
    offsets = jnp.array([2, 0])
    k_l, v_l = paged_cache_write(k_pages[0], v_pages[0], k_new, v_new,
                                 page_ids, offsets)
    np.testing.assert_array_equal(np.asarray(k_l[1, :, 2, :]), np.ones((2, 8)))
    np.testing.assert_array_equal(np.asarray(k_l[3, :, 0, :]), 2 * np.ones((2, 8)))
    np.testing.assert_array_equal(np.asarray(v_l[3, :, 0, :]), -2 * np.ones((2, 8)))
    assert float(jnp.sum(jnp.abs(k_l[2]))) == 0.0
