"""Learned reward model: BCE training + inference-in-the-loop contract.

Reference analog: resnet_reward_model.py compute_reward semantics +
FSDPRewardWorker training (reward_worker.py:391+).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlinf_tpu.models.embodiment.reward_model import (
    CNNRewardModel,
    RewardTrainConfig,
    make_reward_fn,
    make_reward_train_step,
)
from rlinf_tpu.training.train_state import TrainState


def _make_batch(rng, n=128, hw=16):
    """Positive = bright 4x4 patch in the top-left corner."""
    imgs = rng.uniform(0.0, 0.3, (n, hw, hw, 3)).astype(np.float32)
    labels = (rng.random(n) < 0.5).astype(np.float32)
    imgs[labels > 0.5, :4, :4, :] += 0.7
    return imgs, labels


def test_reward_model_trains_and_scores():
    model = CNNRewardModel(image_hw=(16, 16), channels=3,
                           conv_channels=(8, 16), hidden=32)
    tx = optax.adam(1e-3)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step = make_reward_train_step(model, RewardTrainConfig(), tx)

    rng = np.random.default_rng(0)
    metrics = {}
    for _ in range(150):
        imgs, labels = _make_batch(rng)
        batch = {"obs/images": jnp.asarray(imgs),
                 "labels": jnp.asarray(labels)}
        state, metrics = step(state, batch)
    assert float(metrics["reward_model/accuracy"]) > 0.95, metrics

    # held-out probabilities separate the classes
    imgs, labels = _make_batch(rng, n=256)
    probs = np.asarray(model.compute_reward(
        state.params, {"images": jnp.asarray(imgs)}))
    assert probs[labels > 0.5].mean() > 0.8
    assert probs[labels < 0.5].mean() < 0.2

    # thresholded binary mode (reference reward_threshold, use_reward_prob=False)
    thresh_model = CNNRewardModel(image_hw=(16, 16), channels=3,
                                  conv_channels=(8, 16), hidden=32,
                                  reward_threshold=0.6,
                                  use_reward_prob=False)
    binary = np.asarray(thresh_model.compute_reward(
        state.params, {"images": jnp.asarray(imgs)}))
    assert set(np.unique(binary)).issubset({0.0, 1.0})
    assert (binary[labels > 0.5] == 1.0).mean() > 0.9

    # env-loop reward_fn binding
    fn = make_reward_fn(thresh_model, state.params)
    out = np.asarray(fn({"images": jnp.asarray(imgs[:8])}))
    assert out.shape == (8,)


def test_reward_model_with_state_input():
    model = CNNRewardModel(image_hw=(8, 8), channels=1, state_dim=3,
                           conv_channels=(4,), hidden=16)
    params = model.init(jax.random.PRNGKey(1))
    obs = {"images": jnp.zeros((5, 8, 8, 1)), "states": jnp.ones((5, 3))}
    r = model.compute_reward(params, obs)
    assert r.shape == (5,)
