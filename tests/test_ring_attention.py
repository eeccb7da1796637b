"""Ring attention over the context mesh axis vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rlinf_tpu.ops.attention import causal_attention
from rlinf_tpu.ops.ring_attention import ring_attention
from rlinf_tpu.parallel import MeshConfig, make_mesh
from rlinf_tpu.parallel.mesh import AxisNames as Ax


@pytest.mark.parametrize("cp", [2, 4, 8])
def test_ring_attention_matches_reference(devices, cp):
    mesh = make_mesh(MeshConfig(data=-1, context=cp))
    rng = np.random.default_rng(0)
    B, S, H, K, D = 2, 32, 4, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, K, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, K, D)), jnp.float32)

    ref = np.asarray(causal_attention(q, k, v))

    seq_sharding = NamedSharding(mesh, P(None, Ax.CONTEXT, None, None))
    qs = jax.device_put(q, seq_sharding)
    ks = jax.device_put(k, seq_sharding)
    vs = jax.device_put(v, seq_sharding)
    with jax.set_mesh(mesh):
        out = ring_attention(qs, ks, vs, mesh=mesh, axis=Ax.CONTEXT)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_ring_attention_with_padding(devices):
    mesh = make_mesh(MeshConfig(data=-1, context=4))
    rng = np.random.default_rng(1)
    B, S, H, K, D = 1, 16, 2, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, K, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, K, D)), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[0, :5] = False  # left padding
    positions = np.maximum(np.cumsum(mask, 1) - 1, 0)

    ref = np.asarray(
        causal_attention(
            q, k, v,
            positions_q=jnp.asarray(positions),
            positions_kv=jnp.asarray(positions),
            kv_valid_mask=jnp.asarray(mask),
        )
    )
    with jax.set_mesh(mesh):
        out = ring_attention(
            q, k, v, mesh=mesh, axis=Ax.CONTEXT,
            positions=jnp.asarray(positions),
            kv_valid_mask=jnp.asarray(mask),
        )
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out)[m], ref[m], rtol=2e-4, atol=2e-4
    )


def test_ring_attention_grads_flow(devices):
    mesh = make_mesh(MeshConfig(data=-1, context=2))
    rng = np.random.default_rng(2)
    B, S, H, K, D = 1, 8, 2, 2, 4
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, K, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, K, D)), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh, axis=Ax.CONTEXT))

    def loss_ref(q, k, v):
        return jnp.sum(causal_attention(q, k, v))

    with jax.set_mesh(mesh):
        g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
