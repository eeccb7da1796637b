"""VLA checkpoint import round-trip (reference ckpt_convertor analog).

No pretrained weights exist in this image, so correctness = exact round-trip
through the prismatic/timm naming plus forward parity after reload."""

import numpy as np
import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.hf_import import (
    load_vla_pretrained,
    read_checkpoint_dir,
    save_checkpoint_dir,
    vla_params_from_state_dict,
    vla_params_to_state_dict,
)
from rlinf_tpu.models.embodiment.openvla import OpenVLAConfig, OpenVLAPolicy


def _policy():
    return OpenVLAPolicy(OpenVLAConfig(action_dim=3, action_bins=32))


def test_state_dict_round_trip_exact():
    policy = _policy()
    params = policy.init(jax.random.PRNGKey(0))
    sd = vla_params_to_state_dict(params, policy)
    # prismatic/timm naming present
    assert "vision_backbone.blocks.0.attn.qkv.weight" in sd
    assert "projector.fc1.weight" in sd
    assert any(k.startswith("language_model.model.layers.0.") for k in sd)
    back = vla_params_from_state_dict(sd, policy)
    for section in ("vit", "img_proj", "vlm"):
        a = jax.tree_util.tree_leaves(params[section])
        b = jax.tree_util.tree_leaves(back[section])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(
                np.asarray(x, np.float32), np.asarray(y, np.float32)
            )


def test_checkpoint_dir_round_trip_and_forward_parity(tmp_path):
    policy = _policy()
    params = policy.init(jax.random.PRNGKey(1))
    sd = vla_params_to_state_dict(params, policy)
    save_checkpoint_dir(sd, str(tmp_path / "ckpt"))
    assert (tmp_path / "ckpt" / "model.safetensors").exists()

    loaded = load_vla_pretrained(str(tmp_path / "ckpt"), policy,
                                 rng=jax.random.PRNGKey(2))
    assert "value_head" in loaded  # RL head from fresh init

    obs = {
        "images": jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3)),
        "instruction_ids": jnp.zeros((2, 4), jnp.int32),
    }
    actions = jnp.zeros((2, 3), jnp.float32)
    ref = policy.default_forward(params, obs, actions)
    got = policy.default_forward(loaded, obs, actions)
    np.testing.assert_allclose(
        np.asarray(ref["logprobs"]), np.asarray(got["logprobs"]),
        rtol=1e-5, atol=1e-5,
    )


def test_torch_bin_checkpoint_readable(tmp_path):
    import torch

    policy = _policy()
    params = policy.init(jax.random.PRNGKey(0))
    sd = vla_params_to_state_dict(params, policy)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    back = read_checkpoint_dir(str(tmp_path))
    np.testing.assert_array_equal(
        back["vision_backbone.pos_embed"],
        np.asarray(params["vit"]["pos_embed"], np.float32),
    )


def _fused_timm_policy():
    from rlinf_tpu.models.embodiment.vit import ViTConfig

    vit = ViTConfig(image_size=32, patch_size=16, hidden=64, layers=2,
                    heads=4, timm_style=True, cls_token=True)
    vit2 = ViTConfig(image_size=32, patch_size=16, hidden=48, layers=2,
                     heads=4, timm_style=True)
    return OpenVLAPolicy(OpenVLAConfig(action_dim=3, action_bins=32),
                         vit_cfg=vit, vit2_cfg=vit2)


def test_timm_fused_round_trip_exact():
    """Real prismatic naming: vision_backbone.featurizer.* (timm keys, conv
    patch embed, per-block biases, cls token) + fused_featurizer.* tower."""
    policy = _fused_timm_policy()
    params = policy.init(jax.random.PRNGKey(0))
    # give biases nonzero values so the round-trip actually checks them
    params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        if a.dtype == jnp.float32 else a, params)
    sd = vla_params_to_state_dict(params, policy)
    # true timm key names
    assert "vision_backbone.featurizer.patch_embed.proj.weight" in sd
    assert sd["vision_backbone.featurizer.patch_embed.proj.weight"].shape == \
        (64, 3, 16, 16)
    assert "vision_backbone.featurizer.blocks.0.attn.qkv.bias" in sd
    assert "vision_backbone.featurizer.cls_token" in sd
    assert sd["vision_backbone.featurizer.pos_embed"].shape[0] == 1
    assert "vision_backbone.fused_featurizer.blocks.1.mlp.fc2.bias" in sd
    back = vla_params_from_state_dict(sd, policy)
    for section in ("vit", "vit2", "img_proj", "vlm"):
        a = jax.tree_util.tree_leaves(params[section])
        b = jax.tree_util.tree_leaves(back[section])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                rtol=1e-6, atol=1e-6)


def test_timm_fused_forward_parity(tmp_path):
    policy = _fused_timm_policy()
    params = policy.init(jax.random.PRNGKey(1))
    sd = vla_params_to_state_dict(params, policy)
    save_checkpoint_dir(sd, str(tmp_path / "ckpt"))
    loaded = load_vla_pretrained(str(tmp_path / "ckpt"), policy,
                                 rng=jax.random.PRNGKey(2))
    obs = {
        "images": jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3)),
        "instruction_ids": jnp.zeros((2, 4), jnp.int32),
    }
    actions = jnp.zeros((2, 3), jnp.float32)
    ref = policy.default_forward(params, obs, actions)
    got = policy.default_forward(loaded, obs, actions)
    np.testing.assert_allclose(
        np.asarray(ref["logprobs"]), np.asarray(got["logprobs"]),
        rtol=1e-5, atol=1e-5)


def test_timm_naming_requires_timm_style_vit():
    import pytest

    policy = _policy()  # RMSNorm tower
    fused = _fused_timm_policy()
    params = fused.init(jax.random.PRNGKey(0))
    sd = vla_params_to_state_dict(params, fused)
    with pytest.raises(ValueError, match="timm_style"):
        vla_params_from_state_dict(sd, policy)
