"""Minimal ViT image encoder (patchify + pre-norm transformer, NHWC).

Backbone for VLA policies — the in-tree analog of the reference's prismatic /
SigLIP vision towers (reference rlinf/models/embodiment/prismatic, ~4k LoC of
torch). Reuses the framework's attention op in bidirectional mode (all
positions equal => no causal mask).

Two parameterizations:
  * default — RMSNorm, bias-free projections (the TPU-lean choice for
    from-scratch training);
  * ``timm_style=True`` — LayerNorm with bias, biased qkv/proj/mlp, optional
    class token: structurally matches timm ``vision_transformer`` blocks so
    real prismatic/OpenVLA ``vision_backbone.featurizer.*`` checkpoints load
    losslessly (reference prismatic backbone = timm ViT towers,
    rlinf/models/embodiment — see models/embodiment/hf_import.py).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.ops.attention import causal_attention
from rlinf_tpu.ops.norm import rms_norm


def _linear_init(rng, fan_in, fan_out, scale=None):
    scale = scale or (1.0 / math.sqrt(fan_in))
    w = jax.random.uniform(rng, (fan_in, fan_out), jnp.float32, -scale, scale)
    return {"w": w, "b": jnp.zeros((fan_out,), jnp.float32)}


class ViTConfig:
    def __init__(
        self,
        image_size: int = 96,
        patch_size: int = 16,
        hidden: int = 128,
        layers: int = 4,
        heads: int = 4,
        mlp_ratio: int = 4,
        channels: int = 3,
        timm_style: bool = False,
        cls_token: bool = False,
    ):
        assert image_size % patch_size == 0
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden = hidden
        self.layers = layers
        self.heads = heads
        self.mlp_ratio = mlp_ratio
        self.channels = channels
        self.timm_style = timm_style
        self.cls_token = cls_token and timm_style
        self.num_patches = (image_size // patch_size) ** 2
        self.patch_dim = patch_size * patch_size * channels

    @property
    def num_tokens(self) -> int:
        return self.num_patches + (1 if self.cls_token else 0)


def init_vit(cfg: ViTConfig, rng: jax.Array) -> Dict:
    keys = jax.random.split(rng, 6)
    L, D = cfg.layers, cfg.hidden
    F = D * cfg.mlp_ratio
    init = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.02
    params = {
        "patch_proj": _linear_init(keys[0], cfg.patch_dim, D),
        "pos_embed": init(keys[1], (cfg.num_tokens, D)),
        "blocks": {
            "norm1": jnp.ones((L, D), jnp.float32),
            "wqkv": init(keys[2], (L, D, 3 * D)),
            "wo": init(keys[3], (L, D, D)),
            "norm2": jnp.ones((L, D), jnp.float32),
            "w1": init(keys[4], (L, D, F)),
            "w2": init(keys[5], (L, F, D)),
        },
        "final_norm": jnp.ones((D,), jnp.float32),
    }
    if cfg.timm_style:
        params["blocks"].update({
            "norm1_b": jnp.zeros((L, D), jnp.float32),
            "bqkv": jnp.zeros((L, 3 * D), jnp.float32),
            "bo": jnp.zeros((L, D), jnp.float32),
            "norm2_b": jnp.zeros((L, D), jnp.float32),
            "b1": jnp.zeros((L, F), jnp.float32),
            "b2": jnp.zeros((L, D), jnp.float32),
        })
        params["final_norm_b"] = jnp.zeros((D,), jnp.float32)
        if cfg.cls_token:
            params["cls_token"] = jnp.zeros((D,), jnp.float32)
    return params


def _layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, N, patch*patch*C]."""
    B, H, W, C = images.shape
    images = images.reshape(B, H // patch, patch, W // patch, patch, C)
    return images.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, (H // patch) * (W // patch), patch * patch * C
    )


def vit_encode(
    params: Dict, cfg: ViTConfig, images: jax.Array, *, remat: bool = False,
    unroll: bool = False,
) -> jax.Array:
    """[B, H, W, C] (uint8 or float) -> [B, N, D] patch features.

    With ``cfg.cls_token`` the class token is prepended (position 0) and kept
    in the output — callers that want patch features slice ``[:, 1:]``.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0 - 0.5
    x = patchify(images.astype(jnp.float32), cfg.patch_size)
    x = x @ params["patch_proj"]["w"] + params["patch_proj"]["b"]
    if cfg.cls_token:
        cls = jnp.broadcast_to(params["cls_token"], (x.shape[0], 1, cfg.hidden))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]
    B, N, D = x.shape
    Hd = D // cfg.heads
    # bidirectional attention: equal positions disable the causal mask
    pos = jnp.zeros((B, N), jnp.int32)
    timm = cfg.timm_style

    def norm1(x, layer):
        if timm:
            return _layer_norm(x, layer["norm1"], layer["norm1_b"])
        return rms_norm(x, layer["norm1"])

    def norm2(x, layer):
        if timm:
            return _layer_norm(x, layer["norm2"], layer["norm2_b"])
        return rms_norm(x, layer["norm2"])

    def block(x, layer):
        h = norm1(x, layer)
        qkv = h @ layer["wqkv"]
        if timm:
            qkv = qkv + layer["bqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, cfg.heads, Hd)
        k = k.reshape(B, N, cfg.heads, Hd)
        v = v.reshape(B, N, cfg.heads, Hd)
        attn = causal_attention(q, k, v, positions_q=pos, positions_kv=pos)
        o = attn.reshape(B, N, D) @ layer["wo"]
        if timm:
            o = o + layer["bo"]
        x = x + o
        h = norm2(x, layer)
        # timm uses exact erf-GELU (torch nn.GELU default); our from-scratch
        # towers keep the cheaper tanh approximation
        h = jax.nn.gelu(h @ layer["w1"] + (layer["b1"] if timm else 0.0),
                        approximate=not timm)
        x = x + (h @ layer["w2"] + (layer["b2"] if timm else 0.0))
        return x, None

    if remat:
        # full-geometry VLA training: per-layer rematerialization keeps the
        # 27-layer So400m-class tower's activations off HBM in the bwd pass
        block = jax.checkpoint(block)
    if unroll:
        # avoid XLA's hoisted whole-stack weight transposes in scan bwd
        for i in range(cfg.layers):
            layer = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
            x, _ = block(x, layer)
    else:
        x, _ = jax.lax.scan(block, x, params["blocks"])
    if timm:
        return _layer_norm(x, params["final_norm"], params["final_norm_b"])
    return rms_norm(x, params["final_norm"])
