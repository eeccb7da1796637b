"""Learned reward models: CNN success classifier + trainable update step.

Reference analog: rlinf/models/embodiment/reward/{base_reward_model,
resnet_reward_model,vlm_reward_model}.py + the reward workers
(rlinf/workers/reward/reward_worker.py EmbodiedRewardWorker :160-390 for
inference-in-the-rollout-loop, FSDPRewardWorker :391+ for training):

  * ``compute_reward``: image (and optional state) observations → sigmoid
    success probability, optionally thresholded to a binary reward
    (resnet_reward_model.py:267-301, worker reward_threshold/use_reward_prob).
  * Training: binary cross-entropy against success labels
    (resnet_reward_model.py:251), accuracy validation (run_eval :572).

TPU design: the reward model is one more pure function — the embodied env
loop calls the jitted ``compute_reward`` on the already-batched device
observations instead of round-tripping a channel to a reward worker process.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from rlinf_tpu.models.embodiment.cnn_policy import _conv_apply, _conv_init
from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init
from rlinf_tpu.training.learner import optax_global_norm
from rlinf_tpu.training.train_state import TrainState


class CNNRewardModel:
    """Small conv trunk + binary success head (the ResNetRewardModel analog,
    sized for the toy/vector envs; swap the trunk for the ViT for real
    images). Obs contract: ``images`` [B, H, W, C] float in [0, 1], optional
    ``states`` [B, S] concatenated into the head."""

    def __init__(
        self,
        image_hw: Tuple[int, int] = (32, 32),
        channels: int = 3,
        state_dim: int = 0,
        conv_channels: Sequence[int] = (16, 32),
        hidden: int = 128,
        reward_threshold: Optional[float] = None,
        use_reward_prob: bool = True,
    ):
        self.image_hw = image_hw
        self.channels = channels
        self.state_dim = state_dim
        self.conv_channels = tuple(conv_channels)
        self.hidden = hidden
        self.reward_threshold = reward_threshold
        self.use_reward_prob = use_reward_prob

    def init(self, rng: jax.Array) -> Dict:
        keys = jax.random.split(rng, len(self.conv_channels) + 1)
        convs = []
        cin = self.channels
        h, w = self.image_hw
        for i, cout in enumerate(self.conv_channels):
            convs.append(_conv_init(keys[i], 3, 3, cin, cout))
            cin = cout
            # stride-2 VALID 3x3 convs (cnn_policy._conv_apply)
            h, w = (h - 3) // 2 + 1, (w - 3) // 2 + 1
        feat_dim = h * w * cin + self.state_dim
        head = _mlp_init(keys[-1], (feat_dim, self.hidden, 1), scale_last=1.0)
        return {"convs": convs, "head": head}

    def logits(self, params, obs: Dict[str, jax.Array]) -> jax.Array:
        x = obs["images"].astype(jnp.float32)
        for conv in params["convs"]:
            x = jax.nn.relu(_conv_apply(conv, x, stride=2))
        x = x.reshape(x.shape[0], -1)
        if self.state_dim:
            x = jnp.concatenate(
                [x, obs["states"].astype(jnp.float32)], axis=-1)
        return _mlp_apply(params["head"], x, activation=jax.nn.relu)[..., 0]

    def compute_reward(self, params, obs: Dict[str, jax.Array]) -> jax.Array:
        """[B] sigmoid probability; thresholded to {0,1} when
        ``reward_threshold`` is set and ``use_reward_prob`` is False
        (reference resnet_reward_model.py:292-301)."""
        prob = jax.nn.sigmoid(self.logits(params, obs))
        if self.reward_threshold is not None and not self.use_reward_prob:
            return (prob > self.reward_threshold).astype(jnp.float32)
        return prob


@dataclasses.dataclass(frozen=True)
class RewardTrainConfig:
    pos_weight: float = 1.0       # BCE positive-class weight


def make_reward_train_step(
    model: CNNRewardModel,
    cfg: RewardTrainConfig,
    tx: optax.GradientTransformation,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict]]:
    """BCE-with-logits over {obs/*, labels [B] in {0,1}} batches (the
    FSDPRewardWorker training step, reference reward_worker.py:391+)."""

    def loss_fn(params, batch):
        obs = {k[len("obs/"):]: v for k, v in batch.items()
               if k.startswith("obs/")}
        labels = batch["labels"].astype(jnp.float32)
        logits = model.logits(params, obs)
        # weighted BCE with logits (stable form)
        log_p = jax.nn.log_sigmoid(logits)
        log_np = jax.nn.log_sigmoid(-logits)
        loss = -jnp.mean(cfg.pos_weight * labels * log_p
                         + (1.0 - labels) * log_np)
        acc = jnp.mean(((logits > 0) == (labels > 0.5)).astype(jnp.float32))
        return loss, {"reward_model/bce": loss, "reward_model/accuracy": acc}

    def step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["reward_model/grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_reward_fn(model: CNNRewardModel, params) -> Callable:
    """Bind params into a jitted obs→reward function the env loop can call in
    place of (or in addition to) the simulator reward — the
    reward-model-in-the-loop hookup (reference env_worker.py:748)."""
    fn = jax.jit(lambda p, o: model.compute_reward(p, o))
    return lambda obs: fn(params, obs)
