"""Fused linear-CE Pallas kernel vs the XLA reference (interpret mode).

Covers: both weight layouts, temperature, vocab-pad path (V not a multiple
of the tile), row-pad path (N not a multiple of the row block), forward
values and gradients (dh, dw) of a mixed logprob+entropy scalar loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlinf_tpu.ops.logprobs import logprobs_and_entropy_from_logits
from rlinf_tpu.ops.pallas.linear_ce import fused_linear_ce


def _ref(hidden, w_dv, tgt, temperature):
    logits = jnp.einsum(
        "...d,dv->...v", hidden, w_dv, preferred_element_type=jnp.float32
    )
    return logprobs_and_entropy_from_logits(logits, tgt, temperature)


@pytest.mark.parametrize("w_layout", ["dv", "vd"])
@pytest.mark.parametrize("shape", [(2, 16, 128, 1000), (1, 40, 256, 2048)])
def test_forward_matches_reference(w_layout, shape):
    B, S, D, V = shape
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    w_dv = jnp.asarray(rng.normal(size=(D, V)) * 0.05, jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, V, (B, S)), jnp.int32)
    w = w_dv if w_layout == "dv" else w_dv.T

    lp, ent = fused_linear_ce(
        h, w, tgt, temperature=0.7, w_layout=w_layout, interpret=True
    )
    lp_ref, ent_ref = _ref(h, w_dv, tgt, 0.7)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ent), np.asarray(ent_ref),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("w_layout", ["dv", "vd"])
def test_gradients_match_reference(w_layout):
    B, S, D, V = 2, 24, 128, 1500
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    w_dv = jnp.asarray(rng.normal(size=(D, V)) * 0.05, jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, V, (B, S)), jnp.int32)
    adv = jnp.asarray(rng.normal(size=(B, S)), jnp.float32)
    w = w_dv if w_layout == "dv" else w_dv.T

    def loss_fused(h, w):
        lp, ent = fused_linear_ce(
            h, w, tgt, temperature=1.0, w_layout=w_layout, interpret=True
        )
        return jnp.mean(lp * adv) + 0.03 * jnp.mean(ent)

    def loss_ref(h, w):
        w_dv_ = w if w_layout == "dv" else w.T
        lp, ent = _ref(h, w_dv_, tgt, 1.0)
        return jnp.mean(lp * adv) + 0.03 * jnp.mean(ent)

    (dh_f, dw_f) = jax.grad(loss_fused, argnums=(0, 1))(h, w)
    (dh_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(h, w)
    # dz is emitted bf16: tolerance is the bf16 gradient class
    np.testing.assert_allclose(
        np.asarray(dh_f, np.float32), np.asarray(dh_r, np.float32),
        rtol=0.05, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(dw_f, np.float32), np.asarray(dw_r, np.float32),
        rtol=0.05, atol=2e-4,
    )


def test_entropy_gradient_formula():
    """Entropy-only gradient against autodiff of the dense reference."""
    N, D, V = 16, 64, 300
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, (N,)), jnp.int32)

    def ent_fused(h):
        _, ent = fused_linear_ce(h, w, tgt, w_layout="dv", interpret=True)
        return jnp.sum(ent)

    def ent_ref(h):
        logits = (h @ w).astype(jnp.float32)
        _, ent = logprobs_and_entropy_from_logits(logits, tgt)
        return jnp.sum(ent)

    dh_f = jax.grad(ent_fused)(h)
    dh_r = jax.grad(ent_ref)(h)
    np.testing.assert_allclose(np.asarray(dh_f), np.asarray(dh_r),
                               rtol=0.02, atol=1e-3)
