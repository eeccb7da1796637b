"""MoE layer: routing, capacity, aux loss, EP sharding, model integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rlinf_tpu.models.llm import LLMConfig, forward_logits, init_params
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.ops.moe import MoEConfig, init_moe_params, moe_layer
from rlinf_tpu.parallel import MeshConfig, make_mesh, match_partition_rules, shard_pytree
from rlinf_tpu.parallel.mesh import AxisNames as Ax


def _moe_cfg(**kw):
    base = dict(num_experts=4, num_experts_per_token=2, capacity_factor=2.0)
    base.update(kw)
    return MoEConfig(**base)


def test_moe_layer_shapes_and_aux():
    rng = jax.random.PRNGKey(0)
    moe = _moe_cfg()
    params = init_moe_params(rng, hidden=16, ffn=32, moe=moe, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16), jnp.float32)
    out, aux = moe_layer(params, x, moe)
    assert out.shape == x.shape
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_top1_equals_dense_single_expert():
    """E=1, k=1, ample capacity: MoE must reduce to the dense expert MLP."""
    rng = jax.random.PRNGKey(0)
    moe = MoEConfig(num_experts=1, num_experts_per_token=1, capacity_factor=2.0)
    params = init_moe_params(rng, 8, 16, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8), jnp.float32)
    out, _ = moe_layer(params, x, moe)
    t = x.reshape(-1, 8)
    h = jax.nn.silu(t @ params["gate"][0]) * (t @ params["up"][0])
    expected = (h @ params["down"][0]).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_moe_capacity_drops_overflow():
    """capacity_factor so small that most tokens drop -> output mostly zero."""
    rng = jax.random.PRNGKey(0)
    moe = MoEConfig(num_experts=2, num_experts_per_token=1, capacity_factor=0.01)
    params = init_moe_params(rng, 8, 16, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 8), jnp.float32)
    out, _ = moe_layer(params, x, moe)
    # capacity = max(1, 64*1/2*0.01) = 1 slot per expert -> <= 2 nonzero rows
    nonzero_rows = np.abs(np.asarray(out)).sum(-1).reshape(-1) > 1e-6
    assert nonzero_rows.sum() <= 2


def test_moe_gradients_flow_to_all_param_groups():
    rng = jax.random.PRNGKey(0)
    moe = _moe_cfg()
    params = init_moe_params(rng, 8, 16, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8), jnp.float32)

    def loss(p):
        out, aux = moe_layer(p, x, moe)
        return jnp.sum(out**2) + aux

    g = jax.grad(loss)(params)
    for name, leaf in g.items():
        assert float(jnp.abs(leaf).sum()) > 0, f"zero grad for {name}"


def test_moe_llm_forward_and_train(devices):
    cfg = LLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=2, max_seq_len=64, dtype="float32",
        qkv_bias=False, rope_theta=1e4,
        num_experts=4, num_experts_per_token=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert "moe_gate" in params["blocks"]
    assert params["blocks"]["moe_gate"].shape == (2, 4, 32, 64)

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 16)))
    logits = forward_logits(params, cfg, ids)
    assert logits.shape == (2, 16, 128)
    assert np.isfinite(np.asarray(logits)).all()

    # EP sharding: expert dim splits over the expert axis
    mesh = make_mesh(MeshConfig(data=-1, expert=4))
    specs = match_partition_rules(M.partition_rules(), params)
    sharded = shard_pytree(params, specs, mesh)
    shard_shape = sharded["blocks"]["moe_gate"].addressable_shards[0].data.shape
    assert shard_shape == (2, 1, 32, 64)  # 4 experts / 4-way expert axis

    # one PPO train step end-to-end with MoE aux in the loss
    from rlinf_tpu.training.learner import PolicyLossConfig, make_policy_train_step
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )

    tx = make_optimizer(OptimizerConfig(lr=1e-4))
    state = create_train_state(lambda r: init_params(cfg, r), tx, jax.random.PRNGKey(1))
    step = make_policy_train_step(cfg, PolicyLossConfig(logprob_chunk_size=16), tx)
    B, T = 4, 32
    r = np.random.default_rng(1)
    batch = {
        "input_ids": jnp.asarray(r.integers(0, 128, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "target_ids": jnp.asarray(r.integers(0, 128, (B, T)), jnp.int32),
        "loss_mask": jnp.ones((B, T), bool),
        "old_logprobs": jnp.asarray(r.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)), jnp.float32),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["actor/loss"]))
    assert float(metrics["actor/moe_aux_loss"]) > 0


def test_moe_generation_runs():
    cfg = LLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=2, max_seq_len=64, dtype="float32",
        qkv_bias=False, rope_theta=1e4, num_experts=2,
    )
    from rlinf_tpu.models.llm import SamplingParams, generate

    params = init_params(cfg, jax.random.PRNGKey(0))
    out = generate(
        params, cfg, jax.random.PRNGKey(1),
        jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 8))),
        jnp.ones((2, 8), bool),
        SamplingParams(max_new_tokens=4, eos_token_id=-1),
    )
    assert out.response_ids.shape == (2, 4)


# ---------------------------------------------------------------------------
# Dropless (sort + ragged_dot) path
# ---------------------------------------------------------------------------

def test_dropless_matches_capacity_when_nothing_drops():
    """With capacity ample enough that the einsum path drops nothing, the two
    dispatch implementations are the same mathematical function."""
    from rlinf_tpu.ops.moe import moe_layer_capacity, moe_layer_dropless

    rng = jax.random.PRNGKey(0)
    moe = _moe_cfg(capacity_factor=8.0)   # capacity >= N*k: zero drops
    params = init_moe_params(rng, 16, 32, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16), jnp.float32)
    out_cap, aux_cap = moe_layer_capacity(params, x, moe)
    out_drop, aux_drop, metrics = moe_layer_dropless(params, x, moe)
    np.testing.assert_allclose(
        np.asarray(out_cap), np.asarray(out_drop), rtol=1e-5, atol=1e-5
    )
    # Same /topk normalization convention: identical routing => identical aux.
    np.testing.assert_allclose(
        float(aux_cap), float(aux_drop), rtol=1e-5, atol=1e-7
    )
    assert float(metrics["moe_overflow_frac"]) == 0.0
    assert float(metrics["moe_max_load"]) >= 1.0 >= float(metrics["moe_min_load"])


def test_dropless_keeps_tokens_capacity_drops():
    """Tight capacity: einsum path drops routings (overflow_frac > 0) while
    the dropless output still routes every token."""
    from rlinf_tpu.ops.moe import capacity_overflow_frac, moe_layer_dropless

    rng = jax.random.PRNGKey(2)
    moe = _moe_cfg(capacity_factor=0.25)
    params = init_moe_params(rng, 16, 32, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16), jnp.float32)
    frac = float(capacity_overflow_frac(params, x, moe))
    assert frac > 0.0
    out, _, metrics = moe_layer_dropless(params, x, moe)
    assert float(metrics["moe_overflow_frac"]) == 0.0
    # every token got at least one expert's output (nonzero rows)
    rows = np.abs(np.asarray(out)).reshape(-1, 16).sum(-1)
    assert (rows > 0).all()


def test_dropless_gradients_flow():
    from rlinf_tpu.ops.moe import moe_layer_dropless

    rng = jax.random.PRNGKey(0)
    moe = _moe_cfg(impl="dropless")
    params = init_moe_params(rng, 8, 16, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8), jnp.float32)

    def loss(p):
        out, aux, _ = moe_layer_dropless(p, x, moe)
        return jnp.sum(out ** 2) + aux

    grads = jax.jit(jax.grad(loss))(params)
    for name in ("router", "gate", "up", "down"):
        g = np.asarray(grads[name])
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0, name


def test_model_forward_with_dropless_moe():
    cfg = LLMConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32, num_layers=2,
        num_heads=2, num_kv_heads=1, max_seq_len=32, dtype="float32",
        num_experts=4, num_experts_per_token=2, moe_impl="dropless",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
    logits = forward_logits(params, cfg, ids)
    assert logits.shape == (2, 8, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_dropless_ep_matches_unsharded(devices):
    """8-way expert-parallel ragged_all_to_all dispatch == the single-shard
    dropless path (same math, distributed execution)."""
    from jax.sharding import Mesh
    from rlinf_tpu.ops.moe import moe_layer_dropless, moe_layer_dropless_ep

    mesh = Mesh(np.array(devices).reshape(8), ("expert",))
    moe = MoEConfig(num_experts=8, num_experts_per_token=2)
    rng = jax.random.PRNGKey(0)
    params = init_moe_params(rng, 16, 32, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 16), jnp.float32)

    ref, aux_ref, _ = moe_layer_dropless(params, x, moe)
    out, aux = moe_layer_dropless_ep(params, x, moe, mesh)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(float(aux_ref), float(aux), rtol=1e-5)


def test_dropless_ep_grads_flow(devices):
    from jax.sharding import Mesh
    from rlinf_tpu.ops.moe import moe_layer_dropless_ep

    mesh = Mesh(np.array(devices).reshape(8), ("expert",))
    moe = MoEConfig(num_experts=8, num_experts_per_token=2)
    params = init_moe_params(jax.random.PRNGKey(0), 8, 16, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 8), jnp.float32)

    def loss(p):
        out, aux = moe_layer_dropless_ep(p, x, moe, mesh)
        return jnp.sum(out ** 2) + aux

    grads = jax.jit(jax.grad(loss))(params)
    for name in ("router", "gate", "up", "down"):
        g = np.asarray(grads[name])
        assert np.isfinite(g).all() and np.abs(g).sum() > 0, name
