"""Advantage estimators vs slow numpy oracles (reference semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rlinf_tpu.algorithms import get_advantage_fn


def _np_gae(rewards, values, dones, gamma, lam):
    T, B = rewards.shape
    returns = np.zeros_like(rewards)
    gae = np.zeros(B)
    for t in reversed(range(T)):
        not_done = 1.0 - dones[t + 1]
        delta = rewards[t] + gamma * values[t + 1] * not_done - values[t]
        gae = delta + gamma * lam * not_done * gae
        returns[t] = gae + values[t]
    adv = returns - values[:-1]
    return adv, returns


def test_gae_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    T, B = 12, 4
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T + 1, B)).astype(np.float32)
    dones = np.zeros((T + 1, B), np.float32)
    dones[5, 1] = 1.0
    dones[-1] = 1.0

    adv_np, ret_np = _np_gae(rewards, values, dones, 0.99, 0.95)
    fn = get_advantage_fn("gae")
    adv, ret = fn(
        rewards=jnp.asarray(rewards),
        values=jnp.asarray(values),
        dones=jnp.asarray(dones),
        gamma=0.99,
        gae_lambda=0.95,
        normalize_advantages=False,
    )
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_np, rtol=1e-5, atol=1e-5)


def test_gae_critic_free_is_reward_to_go():
    T, B = 5, 2
    rewards = np.ones((T, B), np.float32)
    fn = get_advantage_fn("gae")
    adv, ret = fn(rewards=jnp.asarray(rewards), normalize_advantages=False)
    expected = np.arange(T, 0, -1, dtype=np.float32)[:, None] * np.ones((1, B))
    np.testing.assert_allclose(np.asarray(ret), expected)
    np.testing.assert_allclose(np.asarray(adv), expected)


def test_gae_normalization_masked():
    rng = np.random.default_rng(1)
    T, B = 8, 3
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T + 1, B)).astype(np.float32)
    dones = np.zeros((T + 1, B), np.float32)
    mask = (rng.random((T, B)) > 0.3).astype(np.float32)
    fn = get_advantage_fn("gae")
    adv, _ = fn(
        rewards=jnp.asarray(rewards),
        values=jnp.asarray(values),
        dones=jnp.asarray(dones),
        gamma=1.0,
        gae_lambda=1.0,
        normalize_advantages=True,
        loss_mask=jnp.asarray(mask),
    )
    adv = np.asarray(adv)
    valid = adv[mask.astype(bool)]
    assert abs(valid.mean()) < 0.1
    assert abs(valid.std(ddof=1) - 1.0) < 0.05


def test_grpo_group_standardization():
    group_size = 4
    rewards = np.array([1.0, 0.0, 1.0, 0.0, 5.0, 5.0, 5.0, 5.0], np.float32)
    L, B = 6, 8
    mask = np.ones((L, B), np.float32)
    mask[3:, 0] = 0  # ragged sequence
    fn = get_advantage_fn("grpo")
    adv, aux = fn(
        rewards=jnp.asarray(rewards), loss_mask=jnp.asarray(mask), group_size=group_size
    )
    assert aux is None
    adv = np.asarray(adv)
    # Group 1: mean .5, std (ddof=1) = 0.57735; adv = +-0.5/(0.57735+1e-6)
    expected = 0.5 / (np.std([1, 0, 1, 0], ddof=1) + 1e-6)
    np.testing.assert_allclose(adv[0, 0], expected, rtol=1e-5)
    np.testing.assert_allclose(adv[0, 1], -expected, rtol=1e-5)
    # Group 2 has zero variance => advantage 0
    np.testing.assert_allclose(adv[:, 4:], 0.0, atol=1e-6)
    # Mask zeroes out invalid tokens
    np.testing.assert_allclose(adv[3:, 0], 0.0)


def test_reinpp_places_reward_at_eos_and_whitens():
    rewards = np.array([1.0, -1.0], np.float32)
    L, B = 5, 2
    mask = np.zeros((L, B), np.float32)
    mask[:3, 0] = 1  # seq 0 ends at t=2
    mask[:5, 1] = 1  # seq 1 ends at t=4
    fn = get_advantage_fn("reinpp")
    adv, _ = fn(
        rewards=jnp.asarray(rewards),
        loss_mask=jnp.asarray(mask),
        group_size=2,
    )
    adv = np.asarray(adv)
    # Return-to-go before whitening: seq0 = [1,1,1,0,0], seq1 = [-1]*5.
    # After masked whitening, seq0's valid tokens share one value > 0,
    # seq1's share one value < 0.
    assert adv[0, 0] > 0 and adv[0, 1] < 0
    np.testing.assert_allclose(adv[:3, 0], adv[0, 0], rtol=1e-5)


def test_raw_advantage_broadcast():
    rewards = np.array([2.0, -3.0], np.float32)
    mask = np.ones((4, 2), np.float32)
    fn = get_advantage_fn("raw")
    adv, _ = fn(rewards=jnp.asarray(rewards), loss_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(adv)[:, 0], 2.0)
    np.testing.assert_allclose(np.asarray(adv)[:, 1], -3.0)


def test_opd_advantages_shape():
    fn = get_advantage_fn("opd")
    prev = jnp.zeros((3, 8))
    teacher = jnp.ones((3, 8))
    adv, _ = fn(prev_logprobs=prev, teacher_logprobs=teacher, num_action_chunks=2)
    assert adv.shape == (3, 2, 4)
    np.testing.assert_allclose(np.asarray(adv), 1.0)
