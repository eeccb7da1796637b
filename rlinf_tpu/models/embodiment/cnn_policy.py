"""CNN Gaussian actor-critic for image observations.

Reference analog: rlinf/models/embodiment/cnn_policy/cnn_policy.py (Nature-CNN
style encoder feeding Gaussian heads). Convolutions run in NHWC — the TPU-
native layout (channels on the 128-lane axis).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.mlp_policy import (
    _mlp_apply,
    _mlp_init,
    gaussian_entropy,
    gaussian_logprob,
)


def _conv_init(rng, kh, kw, cin, cout):
    scale = 1.0 / math.sqrt(kh * kw * cin)
    w = jax.random.uniform(rng, (kh, kw, cin, cout), jnp.float32, -scale, scale)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _conv_apply(layer, x, stride):
    out = jax.lax.conv_general_dilated(
        x, layer["w"], window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + layer["b"]


class CNNGaussianPolicy(Policy):
    """obs[image_key]: [B, H, W, C] uint8 or float; optional proprio vector
    concatenated after the encoder."""

    # Nature-CNN geometry
    CONVS = ((8, 4, 32), (4, 2, 64), (3, 1, 64))  # (kernel, stride, cout)

    def __init__(
        self,
        image_shape: Tuple[int, int, int],  # (H, W, C)
        action_dim: int,
        proprio_dim: int = 0,
        hidden_size: int = 256,
        image_key: str = "images",
        proprio_key: str = "states",
        init_logstd: float = 0.0,
    ):
        self.image_shape = image_shape
        self.action_dim = action_dim
        self.proprio_dim = proprio_dim
        self.hidden_size = hidden_size
        self.image_key = image_key
        self.proprio_key = proprio_key
        self.init_logstd = init_logstd
        # compute encoder output size
        h, w, c = image_shape
        for i, (k, s, co) in enumerate(self.CONVS):
            h = (h - k) // s + 1
            w = (w - k) // s + 1
            c = co
            if h < 1 or w < 1:
                raise ValueError(
                    f"image_shape {image_shape} too small for conv stack: "
                    f"layer {i} (kernel {k}, stride {s}) leaves {h}x{w}; "
                    f"minimum input is 36x36"
                )
        self._enc_out = h * w * c

    def init(self, rng: jax.Array):
        keys = jax.random.split(rng, 6)
        convs = []
        cin = self.image_shape[2]
        for i, (k, s, cout) in enumerate(self.CONVS):
            convs.append(_conv_init(keys[i], k, k, cin, cout))
            cin = cout
        feat_dim = self._enc_out + self.proprio_dim
        return {
            "convs": convs,
            "trunk": _mlp_init(keys[3], (feat_dim, self.hidden_size), scale_last=None),
            "actor_mean": _mlp_init(
                keys[4], (self.hidden_size, self.action_dim), scale_last=0.01
            ),
            "actor_logstd": jnp.full((self.action_dim,), self.init_logstd, jnp.float32),
            "value": _mlp_init(keys[5], (self.hidden_size, 1), scale_last=1.0),
        }

    def _features(self, params, obs):
        x = obs[self.image_key]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        else:
            x = x.astype(jnp.float32)
        for layer, (k, s, _) in zip(params["convs"], self.CONVS):
            x = jax.nn.relu(_conv_apply(layer, x, s))
        x = x.reshape(x.shape[0], -1)
        if self.proprio_dim:
            x = jnp.concatenate(
                [x, obs[self.proprio_key].astype(jnp.float32)], axis=-1
            )
        return jax.nn.relu(_mlp_apply(params["trunk"], x))

    def _dist(self, params, obs):
        feat = self._features(params, obs)
        mean = _mlp_apply(params["actor_mean"], feat)
        logstd = jnp.broadcast_to(params["actor_logstd"], mean.shape)
        return mean, logstd, feat

    def value(self, params, obs):
        feat = self._features(params, obs)
        return _mlp_apply(params["value"], feat)[..., 0]

    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        mean, logstd, feat = self._dist(params, obs)
        return {
            "logprobs": gaussian_logprob(mean, logstd, actions.astype(jnp.float32)),
            "entropy": gaussian_entropy(logstd),
            "values": _mlp_apply(params["value"], feat)[..., 0],
        }

    def predict_action_batch(
        self, params, rng, obs, *, deterministic: bool = False
    ) -> PolicyOutput:
        mean, logstd, feat = self._dist(params, obs)
        if deterministic:
            actions = mean
        else:
            actions = mean + jnp.exp(logstd) * jax.random.normal(
                rng, mean.shape, jnp.float32
            )
        return PolicyOutput(
            actions=actions,
            logprobs=gaussian_logprob(mean, logstd, actions),
            values=_mlp_apply(params["value"], feat)[..., 0],
        )
