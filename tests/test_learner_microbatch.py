"""Gradient-accumulation equivalence for the learner's memory knobs.

The reference guarantees microbatched gradient accumulation equals the
one-big-batch update (megatron_worker.py token-mean normalization); here we
additionally check the TPU memory knobs (unroll_layers, bf16 accumulation)
stay within their precision class of the f32 scan baseline.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.model import init_params
from rlinf_tpu.training.learner import PolicyLossConfig, make_policy_train_step
from rlinf_tpu.training.train_state import (
    OptimizerConfig, create_train_state, make_optimizer,
)


def _cfg():
    return LLMConfig(
        vocab_size=512, hidden_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=32, intermediate_size=256, max_seq_len=128,
    )


def _batch(cfg, B=8, T=32):
    r = np.random.default_rng(0)
    return {
        "input_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "target_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "loss_mask": jnp.asarray(r.random((B, T)) > 0.3),
        "old_logprobs": jnp.asarray(r.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)), jnp.float32),
    }


def _run(cfg, batch, **kw):
    tx = make_optimizer(OptimizerConfig(lr=1e-3))
    state = create_train_state(
        lambda r: init_params(cfg, r), tx, jax.random.PRNGKey(0)
    )
    step = make_policy_train_step(cfg, PolicyLossConfig(), tx, **kw)
    state, metrics = step(state, dict(batch))
    return (
        float(metrics["actor/loss"]),
        float(metrics["actor/grad_norm"]),
        np.asarray(state.params["blocks"]["wq"], np.float32),
    )


def test_unroll_layers_matches_scan():
    cfg = _cfg()
    batch = _batch(cfg)
    l0, g0, p0 = _run(cfg, batch, num_microbatches=2, remat=False)
    l1, g1, p1 = _run(cfg, batch, num_microbatches=2, remat=False,
                      unroll_layers=True)
    assert abs(l0 - l1) < 1e-5
    assert abs(g0 - g1) / max(g0, 1e-9) < 1e-3
    # params are bf16: updates land within one bf16 ulp of the scan path
    np.testing.assert_allclose(p0, p1, rtol=1e-2, atol=5e-4)


def test_bf16_grad_accumulation_close_to_f32():
    cfg = _cfg()
    batch = _batch(cfg)
    l0, g0, p0 = _run(cfg, batch, num_microbatches=4, remat=False)
    l1, g1, p1 = _run(cfg, batch, num_microbatches=4, remat=False,
                      grad_acc_dtype=jnp.bfloat16)
    assert abs(l0 - l1) < 1e-4
    # bf16 accumulator: grad norm within ~2% of the f32 accumulation
    assert abs(g0 - g1) / max(g0, 1e-9) < 0.02
    np.testing.assert_allclose(p0, p1, rtol=0.05, atol=3e-4)


def test_microbatch_equals_big_batch():
    cfg = _cfg()
    batch = _batch(cfg)
    l0, g0, p0 = _run(cfg, batch, num_microbatches=1, remat=False)
    l1, g1, p1 = _run(cfg, batch, num_microbatches=4, remat=False)
    assert abs(l0 - l1) < 1e-4
    assert abs(g0 - g1) / max(g0, 1e-9) < 5e-3
    np.testing.assert_allclose(p0, p1, rtol=1e-2, atol=1e-4)
