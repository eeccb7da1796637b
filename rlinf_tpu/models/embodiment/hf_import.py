"""VLA checkpoint import/export: prismatic-style HF state dicts <-> our trees.

The reference trains *pretrained* OpenVLA/OpenVLA-OFT checkpoints (reference
rlinf/models/embodiment/openvla + prismatic backbone; registry
rlinf/models/__init__.py:274) and ships converters under
rlinf/utils/ckpt_convertor/. This module is the import half for the TPU
build: it reads an HF-format checkpoint directory (safetensors shards with
index, single-file safetensors, or torch .bin) and relayouts prismatic
naming — ``vision_backbone.*`` (timm ViT), ``projector.*`` (MLP),
``language_model.model.*`` (HF decoder) — into the OpenVLAPolicy param tree.
The language-model half reuses the tested LLM importer
(rlinf_tpu/models/llm/hf_import.py).

No pretrained weights ship in this image (zero egress), so correctness is
established by round-trip tests: export a random-init policy to a
prismatic-named checkpoint, re-import, assert exact equality and forward
parity (tests/test_vla_hf_import.py).
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

def vla_params_from_state_dict(state_dict: Mapping[str, object], policy):
    """Prismatic-named state dict -> OpenVLAPolicy param tree.

    Missing RL-only heads (``value_head``) stay absent — callers merge over a
    fresh init (pretrained checkpoints have no critic, same as the
    reference's non-strict load, megatron_model_manager.py:163).
    """
    sd = dict(state_dict)
    vit_cfg = policy.vit_cfg
    L, D = vit_cfg.layers, vit_cfg.hidden

    def g(name):
        return _to_np(sd[name])

    def stack(fmt, transpose=False):
        mats = [_to_np(sd[fmt.format(i=i)]) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), jnp.float32)

    vit = {
        "patch_proj": {
            "w": jnp.asarray(g("vision_backbone.patch_proj.weight").T),
            "b": jnp.asarray(g("vision_backbone.patch_proj.bias")),
        },
        "pos_embed": jnp.asarray(g("vision_backbone.pos_embed")),
        "blocks": {
            "norm1": stack("vision_backbone.blocks.{i}.norm1.weight"),
            "wqkv": stack("vision_backbone.blocks.{i}.attn.qkv.weight",
                          transpose=True),
            "wo": stack("vision_backbone.blocks.{i}.attn.proj.weight",
                        transpose=True),
            "norm2": stack("vision_backbone.blocks.{i}.norm2.weight"),
            "w1": stack("vision_backbone.blocks.{i}.mlp.fc1.weight",
                        transpose=True),
            "w2": stack("vision_backbone.blocks.{i}.mlp.fc2.weight",
                        transpose=True),
        },
        "final_norm": jnp.asarray(g("vision_backbone.norm.weight")),
    }

    img_proj = []
    for i in range(1, 100):
        wk = f"projector.fc{i}.weight"
        if wk not in sd:
            break
        img_proj.append({
            "w": jnp.asarray(g(wk).T),
            "b": jnp.asarray(g(f"projector.fc{i}.bias")),
        })

    lm_sd = {k.removeprefix("language_model."): v
             for k, v in sd.items() if k.startswith("language_model.")}
    vlm = params_from_hf_state_dict(lm_sd, policy.vlm_cfg)

    return {"vit": vit, "img_proj": img_proj, "vlm": vlm}


def vla_params_to_state_dict(params, policy) -> Dict[str, np.ndarray]:
    """Inverse relayout (export half; prismatic/timm naming)."""
    out: Dict[str, np.ndarray] = {}
    vit = params["vit"]
    out["vision_backbone.patch_proj.weight"] = _to_np(vit["patch_proj"]["w"]).T
    out["vision_backbone.patch_proj.bias"] = _to_np(vit["patch_proj"]["b"])
    out["vision_backbone.pos_embed"] = _to_np(vit["pos_embed"])
    out["vision_backbone.norm.weight"] = _to_np(vit["final_norm"])
    b = vit["blocks"]
    for i in range(policy.vit_cfg.layers):
        p = f"vision_backbone.blocks.{i}."
        out[p + "norm1.weight"] = _to_np(b["norm1"][i])
        out[p + "attn.qkv.weight"] = _to_np(b["wqkv"][i]).T
        out[p + "attn.proj.weight"] = _to_np(b["wo"][i]).T
        out[p + "norm2.weight"] = _to_np(b["norm2"][i])
        out[p + "mlp.fc1.weight"] = _to_np(b["w1"][i]).T
        out[p + "mlp.fc2.weight"] = _to_np(b["w2"][i]).T
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
