"""VLA vision-tower parity vs a randomly-initialized TORCH reference.

The reference trains pretrained OpenVLA/prismatic checkpoints whose vision
towers are timm ``vision_transformer`` modules (reference
rlinf/models/embodiment/prismatic). No pretrained weights exist in this
image, so — per the Qwen-vs-transformers parity pattern
(tests/test_qwen3_model.py) — the oracle is a faithful torch implementation
of the timm block (Conv2d patch embed, LayerNorm+bias, biased qkv/proj/mlp,
cls token), randomly initialized, exported under REAL timm key names and
imported through models/embodiment/hf_import.py. Forward parity proves the
relayout conventions (conv kernel flatten order, qkv transpose, LayerNorm
semantics) are right — the part of checkpoint import that silently corrupts
models when wrong."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.hf_import import _import_tower_timm
from rlinf_tpu.models.embodiment.vit import ViTConfig, vit_encode

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class TorchTimmViT(nn.Module):
    """Minimal faithful timm vision_transformer (pre-norm, GELU, no drop)."""

    def __init__(self, img=32, patch=16, dim=64, depth=2, heads=4,
                 mlp_ratio=4, cls_token=True):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        n = (img // patch) ** 2 + (1 if cls_token else 0)
        self.pos_embed = nn.Parameter(torch.randn(1, n, dim) * 0.02)
        if cls_token:
            self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.heads = heads
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(dim, eps=1e-6)
            blk.attn = nn.Module()
            blk.attn.qkv = nn.Linear(dim, dim * 3)
            blk.attn.proj = nn.Linear(dim, dim)
            blk.norm2 = nn.LayerNorm(dim, eps=1e-6)
            blk.mlp = nn.Module()
            blk.mlp.fc1 = nn.Linear(dim, dim * mlp_ratio)
            blk.mlp.fc2 = nn.Linear(dim * mlp_ratio, dim)
            self.blocks.append(blk)
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):                      # x: [B, 3, H, W] float
        x = self.patch_embed.proj(x)           # [B, D, h, w]
        B, D, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)       # [B, N, D] row-major patches
        if hasattr(self, "cls_token"):
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        H = self.heads
        for blk in self.blocks:
            y = blk.norm1(x)
            qkv = blk.attn.qkv(y)              # [B, N, 3D]
            q, k, v = qkv.chunk(3, dim=-1)
            B_, N, _ = q.shape
            hd = D // H
            q = q.view(B_, N, H, hd).transpose(1, 2)
            k = k.view(B_, N, H, hd).transpose(1, 2)
            v = v.view(B_, N, H, hd).transpose(1, 2)
            attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
            attn = attn.softmax(dim=-1)
            y = (attn @ v).transpose(1, 2).reshape(B_, N, D)
            x = x + blk.attn.proj(y)
            y = blk.norm2(x)
            x = x + blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(y)))
        return self.norm(x)

    def timm_state_dict(self, prefix="vision_backbone.featurizer."):
        out = {}
        sd = self.state_dict()
        for k, v in sd.items():
            out[prefix + k] = v
        return out


@pytest.mark.parametrize("cls", [True, False], ids=["cls", "nocls"])
def test_timm_vit_forward_parity(cls):
    torch.manual_seed(0)
    ref = TorchTimmViT(img=32, patch=16, dim=64, depth=2, heads=4,
                       cls_token=cls).eval()
    cfg = ViTConfig(image_size=32, patch_size=16, hidden=64, layers=2,
                    heads=4, timm_style=True, cls_token=cls)
    params = _import_tower_timm(ref.timm_state_dict(),
                                "vision_backbone.featurizer.", cfg)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)  # NHWC
    with torch.no_grad():
        ref_out = ref(torch.tensor(imgs).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(vit_encode(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


def test_timm_projector_parity():
    """Prismatic projector: torch Linear stack vs our MLP after relayout."""
    from rlinf_tpu.models.embodiment.hf_import import (
        vla_params_from_state_dict,
    )
    from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply
    from rlinf_tpu.models.embodiment.openvla import (
        OpenVLAConfig, OpenVLAPolicy,
    )

    torch.manual_seed(1)
    vit_ref = TorchTimmViT(img=32, patch=16, dim=64, depth=1, heads=4,
                           cls_token=False).eval()
    fc1 = nn.Linear(64, 96)
    fc2 = nn.Linear(96, 96)
    sd = vit_ref.timm_state_dict()
    sd["projector.fc1.weight"] = fc1.weight
    sd["projector.fc1.bias"] = fc1.bias
    sd["projector.fc2.weight"] = fc2.weight
    sd["projector.fc2.bias"] = fc2.bias

    from rlinf_tpu.models.llm.config import LLMConfig
    from rlinf_tpu.models.llm.hf_import import params_to_hf_state_dict
    from rlinf_tpu.models.llm.model import init_params

    vlm_cfg = LLMConfig(
        vocab_size=128, hidden_size=96, intermediate_size=128, num_layers=1,
        num_heads=4, num_kv_heads=2, max_seq_len=64, dtype="float32",
    )
    lm_params = init_params(vlm_cfg, jax.random.PRNGKey(0))
    for k, v in params_to_hf_state_dict(lm_params, vlm_cfg).items():
        sd["language_model." + k] = v

    policy = OpenVLAPolicy(
        OpenVLAConfig(action_dim=2, action_bins=16),
        vlm_cfg=vlm_cfg,
        vit_cfg=ViTConfig(image_size=32, patch_size=16, hidden=64, layers=1,
                          heads=4, timm_style=True),
    )
    params = vla_params_from_state_dict(sd, policy)

    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        feats = vit_ref(torch.tensor(imgs).permute(0, 3, 1, 2))
        ref_proj = fc2(torch.nn.functional.gelu(fc1(feats))).numpy()
    ours_feats = vit_encode(params["vit"], policy.vit_cfg, jnp.asarray(imgs))
    ours_proj = np.asarray(_mlp_apply(
        params["img_proj"], ours_feats,
        activation=lambda x: jax.nn.gelu(x, approximate=False),
    ))
    np.testing.assert_allclose(ours_proj, ref_proj, rtol=2e-4, atol=2e-4)
