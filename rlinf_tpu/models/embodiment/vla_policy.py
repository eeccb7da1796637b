"""VLA policy: ViT vision tower + transformer trunk + continuous action-chunk
head (OpenVLA-OFT-style).

Reference analog: the openvla / openvla_oft policy families
(reference rlinf/models/embodiment/openvla_oft, ~1.9k LoC): vision backbone ->
LLM trunk -> parallel-decoded continuous action chunks, trained with PPO over
per-chunk Gaussian logprobs (the OFT recipe RLinf publishes ManiSkill/LIBERO
results with). Scaled-down here: the trunk is this framework's decoder block
stack at configurable width — swap in a pretrained LLM's params for the real
thing.

Sequence layout per step: [img patches ... , proprio token, K action queries]
with bidirectional attention (parallel decoding, not autoregressive — the OFT
speedup). Each action query emits ``action_dim`` means; one state-independent
logstd vector covers the chunk.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.mlp_policy import (
    _mlp_apply,
    _mlp_init,
    gaussian_entropy,
    gaussian_logprob,
)
from rlinf_tpu.models.embodiment.vit import (
    ViTConfig,
    init_vit,
    vit_encode,
)
from rlinf_tpu.ops.attention import causal_attention
from rlinf_tpu.ops.norm import rms_norm


class VLAPolicy(Policy):
    def __init__(
        self,
        *,
        image_size: int = 96,
        patch_size: int = 16,
        action_dim: int = 7,
        action_chunk: int = 8,
        proprio_dim: int = 0,
        hidden: int = 128,
        trunk_layers: int = 2,
        vit_layers: int = 2,
        heads: int = 4,
        image_key: str = "images",
        proprio_key: str = "states",
        init_logstd: float = -1.0,
    ):
        self.vit_cfg = ViTConfig(
            image_size=image_size, patch_size=patch_size, hidden=hidden,
            layers=vit_layers, heads=heads,
        )
        self.action_dim = action_dim
        self.action_chunk = action_chunk
        self.proprio_dim = proprio_dim
        self.hidden = hidden
        self.trunk_layers = trunk_layers
        self.heads = heads
        self.image_key = image_key
        self.proprio_key = proprio_key
        self.init_logstd = init_logstd

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict:
        keys = jax.random.split(rng, 9)
        D, L, F = self.hidden, self.trunk_layers, self.hidden * 4
        init = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.02
        params = {
            "vit": init_vit(self.vit_cfg, keys[0]),
            "action_queries": init(keys[1], (self.action_chunk, D)),
            "trunk": {
                "norm1": jnp.ones((L, D), jnp.float32),
                "wqkv": init(keys[2], (L, D, 3 * D)),
                "wo": init(keys[3], (L, D, D)),
                "norm2": jnp.ones((L, D), jnp.float32),
                "w1": init(keys[4], (L, D, F)),
                "w2": init(keys[5], (L, F, D)),
            },
            "action_head": _mlp_init(keys[6], (D, self.action_dim), scale_last=0.01),
            "actor_logstd": jnp.full(
                (self.action_chunk, self.action_dim), self.init_logstd, jnp.float32
            ),
            "value_head": _mlp_init(keys[7], (D, 1), scale_last=1.0),
        }
        if self.proprio_dim:
            params["proprio_proj"] = _mlp_init(
                keys[8], (self.proprio_dim, D), scale_last=None
            )
        return params

    # ------------------------------------------------------------------
    def _trunk(self, params, obs):
        """-> (action_feats [B, K, D], pooled [B, D])."""
        feats = vit_encode(params["vit"], self.vit_cfg, obs[self.image_key])
        B = feats.shape[0]
        toks = [feats]
        if self.proprio_dim:
            proprio = _mlp_apply(
                [params["proprio_proj"][0]], obs[self.proprio_key].astype(jnp.float32)
            )
            toks.append(proprio[:, None, :])
        queries = jnp.broadcast_to(
            params["action_queries"][None], (B, self.action_chunk, self.hidden)
        )
        toks.append(queries)
        x = jnp.concatenate(toks, axis=1)
        N, D, Hd = x.shape[1], self.hidden, self.hidden // self.heads
        pos = jnp.zeros((B, N), jnp.int32)  # bidirectional (parallel decode)

        def block(x, layer):
            h = rms_norm(x, layer["norm1"])
            q, k, v = jnp.split(h @ layer["wqkv"], 3, axis=-1)
            attn = causal_attention(
                q.reshape(B, N, self.heads, Hd),
                k.reshape(B, N, self.heads, Hd),
                v.reshape(B, N, self.heads, Hd),
                positions_q=pos, positions_kv=pos,
            )
            x = x + attn.reshape(B, N, D) @ layer["wo"]
            h = rms_norm(x, layer["norm2"])
            x = x + jax.nn.gelu(h @ layer["w1"]) @ layer["w2"]
            return x, None

        x, _ = jax.lax.scan(block, x, params["trunk"])
        action_feats = x[:, -self.action_chunk:, :]
        pooled = jnp.mean(x, axis=1)
        return action_feats, pooled

    def _dist(self, params, obs):
        action_feats, pooled = self._trunk(params, obs)
        mean = _mlp_apply(params["action_head"], action_feats)  # [B, K, A]
        logstd = jnp.broadcast_to(params["actor_logstd"], mean.shape)
        return mean, logstd, pooled

    def value(self, params, obs):
        _, pooled = self._trunk(params, obs)
        return _mlp_apply(params["value_head"], pooled)[..., 0]

    # Policy interface ---------------------------------------------------
    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        """actions: [B, K*A] (flattened chunk) or [B, K, A]."""
        mean, logstd, pooled = self._dist(params, obs)
        a = actions.astype(jnp.float32).reshape(mean.shape)
        lp = gaussian_logprob(mean, logstd, a)
        B = mean.shape[0]
        return {
            "logprobs": lp.reshape(B, -1),
            "entropy": gaussian_entropy(logstd).reshape(B, -1),
            "values": _mlp_apply(params["value_head"], pooled)[..., 0],
        }

    def predict_action_batch(
        self, params, rng, obs, *, deterministic: bool = False
    ) -> PolicyOutput:
        mean, logstd, pooled = self._dist(params, obs)
        if deterministic:
            act = mean
        else:
            act = mean + jnp.exp(logstd) * jax.random.normal(
                rng, mean.shape, jnp.float32
            )
        lp = gaussian_logprob(mean, logstd, act)
        B = mean.shape[0]
        return PolicyOutput(
            actions=act.reshape(B, -1),
            logprobs=lp.reshape(B, -1),
            values=_mlp_apply(params["value_head"], pooled)[..., 0],
        )
