"""VLA checkpoint import/export: prismatic-style HF state dicts <-> our trees.

The reference trains *pretrained* OpenVLA/OpenVLA-OFT checkpoints (reference
rlinf/models/embodiment/openvla + prismatic backbone; registry
rlinf/models/__init__.py:274) and ships converters under
rlinf/utils/ckpt_convertor/. This module is the import half for the TPU
build. Two vision-tower naming schemes are handled:

  * **real prismatic/timm naming** — ``vision_backbone.featurizer.*`` (and
    optional ``vision_backbone.fused_featurizer.*`` for the fused
    SigLIP+DINOv2 backbone): timm ``vision_transformer`` keys —
    ``patch_embed.proj.{weight,bias}`` (conv kernel), ``cls_token``,
    ``pos_embed`` [1, N(+1), D], per-block ``norm1/norm2.{weight,bias}``,
    ``attn.qkv.{weight,bias}``, ``attn.proj.{weight,bias}``,
    ``mlp.fc1/fc2.{weight,bias}``, final ``norm.{weight,bias}``. Requires the
    policy's ViT be built with ``timm_style=True`` (models/embodiment/vit.py).
  * **this repo's export format** — ``vision_backbone.patch_proj.*`` +
    bias-free blocks (what :func:`vla_params_to_state_dict` writes for
    RMSNorm towers).

Projector (``projector.fc{i}.*``) and language model
(``language_model.model.*``) are shared between both schemes; the
language-model half reuses the tested LLM importer
(rlinf_tpu/models/llm/hf_import.py).

No pretrained weights ship in this image (zero egress), so correctness is
established by round-trip tests: export a random-init policy to a checkpoint
in each naming scheme, re-import, assert exact equality and forward parity
(tests/test_vla_hf_import.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from rlinf_tpu.models.llm.hf_import import (
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, dtype=np.float32)


# ---------------------------------------------------------------------------
# state dict <-> param tree
# ---------------------------------------------------------------------------

def _import_tower_repo(sd, prefix, vit_cfg):
    """Our export format: ``{prefix}patch_proj.*`` + bias-free blocks."""
    L = vit_cfg.layers

    def g(name):
        return _to_np(sd[prefix + name])

    def stack(fmt, transpose=False):
        mats = [_to_np(sd[prefix + fmt.format(i=i)]) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), jnp.float32)

    return {
        "patch_proj": {
            "w": jnp.asarray(g("patch_proj.weight").T),
            "b": jnp.asarray(g("patch_proj.bias")),
        },
        "pos_embed": jnp.asarray(g("pos_embed")),
        "blocks": {
            "norm1": stack("blocks.{i}.norm1.weight"),
            "wqkv": stack("blocks.{i}.attn.qkv.weight", transpose=True),
            "wo": stack("blocks.{i}.attn.proj.weight", transpose=True),
            "norm2": stack("blocks.{i}.norm2.weight"),
            "w1": stack("blocks.{i}.mlp.fc1.weight", transpose=True),
            "w2": stack("blocks.{i}.mlp.fc2.weight", transpose=True),
        },
        "final_norm": jnp.asarray(g("norm.weight")),
    }


def _conv_patch_to_linear(w: np.ndarray) -> np.ndarray:
    """timm conv patch embed [D, C, p, p] -> [p*p*C, D] matching
    :func:`rlinf_tpu.models.embodiment.vit.patchify`'s (ph, pw, C) flatten."""
    return np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])


def _import_tower_timm(sd, prefix, vit_cfg):
    """Real timm ``vision_transformer`` naming under ``{prefix}`` (e.g.
    ``vision_backbone.featurizer.``). Needs ``vit_cfg.timm_style``."""
    if not vit_cfg.timm_style:
        raise ValueError(
            f"checkpoint uses timm naming under {prefix!r} but the policy's "
            "ViT is not timm_style — build it with "
            "ViTConfig(..., timm_style=True)"
        )
    L = vit_cfg.layers

    def g(name):
        return _to_np(sd[prefix + name])

    def stack(fmt, transpose=False):
        mats = [_to_np(sd[prefix + fmt.format(i=i)]) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), jnp.float32)

    pe = g("pos_embed")
    if pe.ndim == 3:                      # timm stores [1, N(+cls), D]
        pe = pe[0]
    has_cls = prefix + "cls_token" in sd
    if has_cls and not vit_cfg.cls_token:
        raise ValueError(
            f"{prefix}cls_token present but ViTConfig(cls_token=False); the "
            "class-token row of pos_embed would be silently dropped"
        )
    tower = {
        "patch_proj": {
            "w": jnp.asarray(_conv_patch_to_linear(
                g("patch_embed.proj.weight"))),
            "b": jnp.asarray(g("patch_embed.proj.bias")),
        },
        "pos_embed": jnp.asarray(pe),
        "blocks": {
            "norm1": stack("blocks.{i}.norm1.weight"),
            "norm1_b": stack("blocks.{i}.norm1.bias"),
            "wqkv": stack("blocks.{i}.attn.qkv.weight", transpose=True),
            "bqkv": stack("blocks.{i}.attn.qkv.bias"),
            "wo": stack("blocks.{i}.attn.proj.weight", transpose=True),
            "bo": stack("blocks.{i}.attn.proj.bias"),
            "norm2": stack("blocks.{i}.norm2.weight"),
            "norm2_b": stack("blocks.{i}.norm2.bias"),
            "w1": stack("blocks.{i}.mlp.fc1.weight", transpose=True),
            "b1": stack("blocks.{i}.mlp.fc1.bias"),
            "w2": stack("blocks.{i}.mlp.fc2.weight", transpose=True),
            "b2": stack("blocks.{i}.mlp.fc2.bias"),
        },
        "final_norm": jnp.asarray(g("norm.weight")),
        "final_norm_b": jnp.asarray(g("norm.bias")),
    }
    if has_cls:
        cls = g("cls_token")
        tower["cls_token"] = jnp.asarray(cls.reshape(-1))
    return tower


def vla_params_from_state_dict(state_dict: Mapping[str, object], policy):
    """Prismatic-named state dict -> OpenVLAPolicy param tree.

    Detects the vision-tower naming scheme per tower; a
    ``vision_backbone.fused_featurizer.*`` tower maps to ``params["vit2"]``
    (the policy must be built with a matching ``vit2_cfg``). Missing RL-only
    heads (``value_head``) stay absent — callers merge over a fresh init
    (pretrained checkpoints have no critic, same as the reference's
    non-strict load, megatron_model_manager.py:163).
    """
    sd = dict(state_dict)
    vit_cfg = policy.vit_cfg

    if any(k.startswith("vision_backbone.featurizer.") for k in sd):
        vit = _import_tower_timm(sd, "vision_backbone.featurizer.", vit_cfg)
    else:
        vit = _import_tower_repo(sd, "vision_backbone.", vit_cfg)

    out = {"vit": vit}
    if any(k.startswith("vision_backbone.fused_featurizer.") for k in sd):
        vit2_cfg = getattr(policy, "vit2_cfg", None)
        if vit2_cfg is None:
            raise ValueError(
                "checkpoint has a fused vision backbone "
                "(vision_backbone.fused_featurizer.*) but the policy has no "
                "vit2_cfg — build OpenVLAPolicy with fused=True"
            )
        out["vit2"] = _import_tower_timm(
            sd, "vision_backbone.fused_featurizer.", vit2_cfg
        )

    img_proj = []
    for i in range(1, 100):
        wk = f"projector.fc{i}.weight"
        if wk not in sd:
            break
        img_proj.append({
            "w": jnp.asarray(_to_np(sd[wk]).T),
            "b": jnp.asarray(_to_np(sd[f"projector.fc{i}.bias"])),
        })
    out["img_proj"] = img_proj

    lm_sd = {k.removeprefix("language_model."): v
             for k, v in sd.items() if k.startswith("language_model.")}
    out["vlm"] = params_from_hf_state_dict(lm_sd, policy.vlm_cfg)
    return out


def _export_tower_repo(out, prefix, tower, vit_cfg):
    out[prefix + "patch_proj.weight"] = _to_np(tower["patch_proj"]["w"]).T
    out[prefix + "patch_proj.bias"] = _to_np(tower["patch_proj"]["b"])
    out[prefix + "pos_embed"] = _to_np(tower["pos_embed"])
    out[prefix + "norm.weight"] = _to_np(tower["final_norm"])
    b = tower["blocks"]
    for i in range(vit_cfg.layers):
        p = f"{prefix}blocks.{i}."
        out[p + "norm1.weight"] = _to_np(b["norm1"][i])
        out[p + "attn.qkv.weight"] = _to_np(b["wqkv"][i]).T
        out[p + "attn.proj.weight"] = _to_np(b["wo"][i]).T
        out[p + "norm2.weight"] = _to_np(b["norm2"][i])
        out[p + "mlp.fc1.weight"] = _to_np(b["w1"][i]).T
        out[p + "mlp.fc2.weight"] = _to_np(b["w2"][i]).T


def _export_tower_timm(out, prefix, tower, vit_cfg):
    """Inverse of :func:`_import_tower_timm` (true timm key names)."""
    w = _to_np(tower["patch_proj"]["w"])            # [p*p*C, D]
    p_, C, D = vit_cfg.patch_size, vit_cfg.channels, vit_cfg.hidden
    out[prefix + "patch_embed.proj.weight"] = np.transpose(
        w.reshape(p_, p_, C, D), (3, 2, 0, 1)
    )
    out[prefix + "patch_embed.proj.bias"] = _to_np(tower["patch_proj"]["b"])
    out[prefix + "pos_embed"] = _to_np(tower["pos_embed"])[None]
    if "cls_token" in tower:
        out[prefix + "cls_token"] = _to_np(tower["cls_token"]).reshape(1, 1, -1)
    out[prefix + "norm.weight"] = _to_np(tower["final_norm"])
    out[prefix + "norm.bias"] = _to_np(tower["final_norm_b"])
    b = tower["blocks"]
    for i in range(vit_cfg.layers):
        p = f"{prefix}blocks.{i}."
        out[p + "norm1.weight"] = _to_np(b["norm1"][i])
        out[p + "norm1.bias"] = _to_np(b["norm1_b"][i])
        out[p + "attn.qkv.weight"] = _to_np(b["wqkv"][i]).T
        out[p + "attn.qkv.bias"] = _to_np(b["bqkv"][i])
        out[p + "attn.proj.weight"] = _to_np(b["wo"][i]).T
        out[p + "attn.proj.bias"] = _to_np(b["bo"][i])
        out[p + "norm2.weight"] = _to_np(b["norm2"][i])
        out[p + "norm2.bias"] = _to_np(b["norm2_b"][i])
        out[p + "mlp.fc1.weight"] = _to_np(b["w1"][i]).T
        out[p + "mlp.fc1.bias"] = _to_np(b["b1"][i])
        out[p + "mlp.fc2.weight"] = _to_np(b["w2"][i]).T
        out[p + "mlp.fc2.bias"] = _to_np(b["b2"][i])


def vla_params_to_state_dict(params, policy) -> Dict[str, np.ndarray]:
    """Inverse relayout (export half). timm-style towers export under real
    ``vision_backbone.featurizer.*`` timm naming; RMSNorm towers under this
    repo's ``vision_backbone.*`` scheme."""
    out: Dict[str, np.ndarray] = {}
    if policy.vit_cfg.timm_style:
        _export_tower_timm(out, "vision_backbone.featurizer.",
                           params["vit"], policy.vit_cfg)
    else:
        _export_tower_repo(out, "vision_backbone.", params["vit"],
                           policy.vit_cfg)
    if "vit2" in params:
        _export_tower_timm(out, "vision_backbone.fused_featurizer.",
                           params["vit2"], policy.vit2_cfg)
    for i, layer in enumerate(params["img_proj"], start=1):
        out[f"projector.fc{i}.weight"] = _to_np(layer["w"]).T
        out[f"projector.fc{i}.bias"] = _to_np(layer["b"])
    for k, v in params_to_hf_state_dict(params["vlm"], policy.vlm_cfg).items():
        out["language_model." + k] = v
    return out


# ---------------------------------------------------------------------------
# checkpoint directory IO
# ---------------------------------------------------------------------------

def read_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Read an HF checkpoint dir: sharded/single safetensors or torch .bin."""
    index = os.path.join(path, "model.safetensors.index.json")
    sd: Dict[str, np.ndarray] = {}
    if os.path.exists(index):
        from safetensors.numpy import load_file

        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            sd.update(load_file(os.path.join(path, shard)))
        return sd
    single = os.path.join(path, "model.safetensors")
    if os.path.exists(single):
        from safetensors.numpy import load_file

        return dict(load_file(single))
    binpath = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(binpath):
        import torch

        return {k: _to_np(v)
                for k, v in torch.load(binpath, map_location="cpu",
                                       weights_only=True).items()}
    raise FileNotFoundError(
        f"no model.safetensors[.index.json] or pytorch_model.bin in {path}"
    )


def save_checkpoint_dir(state_dict: Mapping[str, np.ndarray], path: str):
    """Write a single-file safetensors checkpoint (HF layout)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()},
              os.path.join(path, "model.safetensors"))


def load_vla_pretrained(path: str, policy, rng=None):
    """Checkpoint dir -> full param tree (pretrained weights merged over a
    fresh init so RL-only heads like value_head are present)."""
    import jax

    sd = read_checkpoint_dir(path)
    pre = vla_params_from_state_dict(sd, policy)
    full = policy.init(rng if rng is not None else jax.random.PRNGKey(0))
    full.update(pre)
    return full
