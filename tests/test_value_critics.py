"""RECAP categorical value critic + STEAM stride critic (VERDICT r4 item 10).

Reference analogs: rlinf/models/embodiment/value_model/recap/modeling_critic.py
(categorical Dirac projection loss, [CLS] value expert) and
value_model/steam/ (pairwise stride classification, ensemble heads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rlinf_tpu.models.embodiment.value_critic import (
    SteamConfig,
    SteamCritic,
    ValueCriticConfig,
    ValueCriticPolicy,
    categorical_value_loss,
    value_atoms,
)


def test_categorical_projection_is_exact_on_atoms():
    # a target exactly on atom k puts all mass on bin k
    logits = jnp.zeros((3, 11))
    atoms = np.asarray(value_atoms(11, -1.0, 0.0))
    t = jnp.asarray([atoms[0], atoms[5], atoms[10]])
    loss, m = categorical_value_loss(logits, t, v_min=-1.0, v_max=0.0)
    # uniform logits -> loss == log(num_bins) for any valid target dist
    np.testing.assert_allclose(np.asarray(loss), np.log(11), rtol=1e-5)


def test_categorical_loss_recovers_target_value():
    # optimizing logits directly should drive E[value] to the target
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (4, 21)) * 0.1
    targets = jnp.asarray([-0.9, -0.5, -0.25, -0.05])
    tx = optax.adam(0.3)
    opt = tx.init(logits)

    def step(logits, opt):
        def f(lg):
            loss, _ = categorical_value_loss(
                lg, targets, v_min=-1.0, v_max=0.0)
            return jnp.mean(loss)

        g = jax.grad(f)(logits)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(logits, up), opt

    for _ in range(200):
        logits, opt = jax.jit(step)(logits, opt)
    atoms = value_atoms(21, -1.0, 0.0)
    v = jnp.sum(jax.nn.softmax(logits, -1) * atoms[None], -1)
    np.testing.assert_allclose(np.asarray(v), np.asarray(targets), atol=0.02)
    _, m = categorical_value_loss(logits, targets, v_min=-1.0, v_max=0.0)
    assert float(m["critic/acc_neighbor"]) == 1.0
    assert float(m["critic/mae"]) < 0.06


def _tiny_critic():
    return ValueCriticPolicy(ValueCriticConfig(num_bins=16))


def _obs(policy, B=4, seed=0):
    r = np.random.default_rng(seed)
    c = policy.cfg
    v = policy.vit_cfg
    return {
        c.image_key: jnp.asarray(
            r.random((B, v.image_size, v.image_size, 3)), jnp.float32),
        c.text_key: jnp.asarray(r.integers(0, 250, (B, 8)), jnp.int32),
        c.text_mask_key: jnp.ones((B, 8), bool),
        c.state_key: jnp.asarray(r.random((B, c.state_dim)), jnp.float32),
    }


def test_recap_critic_shapes_and_determinism():
    pol = _tiny_critic()
    params = pol.init(jax.random.PRNGKey(0))
    obs = _obs(pol)
    v = jax.jit(pol.predict_value)(params, obs)
    assert v.shape == (4,)
    assert (np.asarray(v) >= -1.0 - 1e-5).all()
    assert (np.asarray(v) <= 0.0 + 1e-5).all()
    v2 = jax.jit(pol.predict_value)(params, obs)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


def test_recap_critic_learns_values():
    pol = _tiny_critic()
    params = pol.init(jax.random.PRNGKey(1))
    obs = _obs(pol)
    targets = jnp.asarray([-0.8, -0.6, -0.4, -0.2])
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, m), g = jax.value_and_grad(
            lambda p: pol.loss(p, obs, targets), has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::20]
    v = np.asarray(pol.predict_value(params, obs))
    assert np.abs(v - np.asarray(targets)).max() < 0.25


def test_recap_registered():
    from rlinf_tpu.models import get_model

    pol = get_model("recap_critic")
    assert isinstance(pol, ValueCriticPolicy)


def test_steam_stride_bins():
    c = SteamConfig(num_bins=4, max_stride=8)
    crit = SteamCritic(c)
    strides = jnp.asarray([-8, -5, -4, -1, 1, 4, 5, 8])
    bins = np.asarray(crit.stride_to_bin(strides))
    # halves: [0,1]=regressive (far, near), [2,3]=progressive (near, far)
    np.testing.assert_array_equal(bins, [0, 0, 1, 1, 2, 2, 3, 3])
    # binary legacy mode
    c2 = SteamCritic(SteamConfig(num_bins=2))
    np.testing.assert_array_equal(
        np.asarray(c2.stride_to_bin(jnp.asarray([-3, 2]))), [0, 1])


def test_steam_config_validates():
    with pytest.raises(ValueError):
        SteamConfig(num_bins=3)


def test_steam_ensemble_learns_direction():
    crit = SteamCritic(SteamConfig(num_bins=2, ensemble_size=3))
    params = crit.init(jax.random.PRNGKey(0))
    r = np.random.default_rng(0)
    B = 16
    # "later" frames are brighter: direction is learnable from pixels
    t_a = r.random((B,)).astype(np.float32)
    strides = np.where(r.random(B) > 0.5, 3, -3).astype(np.int32)
    t_b = t_a + 0.1 * strides
    fa = jnp.asarray(np.tile(t_a[:, None, None, None], (1, 32, 32, 3)))
    fb = jnp.asarray(np.tile(t_b[:, None, None, None], (1, 32, 32, 3)))
    strides = jnp.asarray(strides)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, m), g = jax.value_and_grad(
            lambda p: crit.loss(p, fa, fb, strides), has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss, m

    for _ in range(80):
        params, opt, loss, m = step(params, opt)
    assert float(m["critic/stride_acc"]) > 0.9, float(m["critic/stride_acc"])
    # progress score high for forward pairs, low for backward
    prog = np.asarray(crit.progress_score(params, fa, fb))
    fwd = np.asarray(strides) > 0
    assert prog[fwd].mean() > 0.8 and prog[~fwd].mean() < 0.2
    # disagreement is finite and batched
    d = np.asarray(crit.ensemble_disagreement(params, fa, fb))
    assert d.shape == (B,) and np.isfinite(d).all()
