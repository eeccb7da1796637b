"""OpenVLA policy: prismatic-style VLM backbone + discrete action-bin tokens.

TPU-native re-design of the reference's openvla family (reference
rlinf/models/embodiment/openvla ~810 LoC + prismatic backbone ~4k LoC):

  * Backbone: ViT patch features -> 2-layer MLP projector -> causal decoder
    LM (prismatic's [image | instruction] prefix, standard causal attention).
  * Actions are ``action_dim`` DISCRETE tokens: the last ``action_bins``
    entries of the LM vocabulary are repurposed as uniform bins over [-1, 1]
    (the OpenVLA convention of overwriting the least-used vocab tail).
  * Rollout: prefill the multimodal prefix once (KV cache), then
    autoregressively decode ``action_dim`` bin tokens with the framework's
    ``decode_step`` — one fori_loop, no per-step recompile.
  * RL (the RLinf-VLA PPO/GRPO recipe, rlinf_vla.rst:48-141): per-dimension
    categorical logprob/entropy over the bin slice; teacher-forced recompute
    in ``default_forward`` for PPO ratios; value head on the pooled prefix.

The policy's ``actions`` wire format is the BIN INDICES (float-cast) so the
learner can teacher-force exactly what was sampled; ``env_actions`` maps bins
to continuous bin centers (optionally de-normalized by per-dim (low, high)).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init
from rlinf_tpu.models.embodiment.vit import ViTConfig, init_vit, vit_encode
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.model import (
    decode_step,
    forward_hidden,
    init_kv_cache,
    KVCache,
    lm_head_weight,
)


@dataclasses.dataclass(frozen=True)
class OpenVLAConfig:
    action_dim: int = 7
    action_bins: int = 256
    image_key: str = "images"
    text_key: str = "instruction_ids"
    text_mask_key: str = "instruction_mask"
    # optional de-normalization: env_action = low + (center+1)/2 * (high-low)
    action_low: Optional[Tuple[float, ...]] = None
    action_high: Optional[Tuple[float, ...]] = None


class OpenVLAPolicy(Policy):
    def __init__(
        self,
        cfg: OpenVLAConfig = OpenVLAConfig(),
        vlm_cfg: Optional[LLMConfig] = None,
        vit_cfg: Optional[ViTConfig] = None,
        vit2_cfg: Optional[ViTConfig] = None,
    ):
        """``vit2_cfg`` enables the fused dual-tower backbone (prismatic's
        SigLIP+DINOv2 ``fused_featurizer``): both towers encode the image and
        their features concatenate along channels before the projector."""
        self.cfg = cfg
        self.vlm_cfg = vlm_cfg or LLMConfig.tiny(vocab_size=512, max_seq_len=256)
        self.vit_cfg = vit_cfg or ViTConfig(
            image_size=32, patch_size=16, hidden=64, layers=1, heads=4
        )
        self.vit2_cfg = vit2_cfg
        if vit2_cfg is not None:
            assert vit2_cfg.num_patches == self.vit_cfg.num_patches, (
                "fused towers must produce the same patch grid"
            )
        assert self.vlm_cfg.vocab_size > cfg.action_bins
        self.action_dim = cfg.action_dim

    @property
    def _bin_base(self) -> int:
        return self.vlm_cfg.vocab_size - self.cfg.action_bins

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict:
        from rlinf_tpu.models.llm.model import init_params as init_llm

        keys = jax.random.split(rng, 5)
        feat = self.vit_cfg.hidden
        if self.vit2_cfg is not None:
            feat += self.vit2_cfg.hidden
        params = {
            "vit": init_vit(self.vit_cfg, keys[0]),
            # prismatic projector is a 2-layer MLP
            "img_proj": _mlp_init(
                keys[1],
                (feat, self.vlm_cfg.hidden_size, self.vlm_cfg.hidden_size),
                scale_last=None,
            ),
            "vlm": init_llm(self.vlm_cfg, keys[2]),
            "value_head": _mlp_init(
                keys[3], (self.vlm_cfg.hidden_size, 1), scale_last=1.0
            ),
        }
        if self.vit2_cfg is not None:
            params["vit2"] = init_vit(self.vit2_cfg, keys[4])
        return params

    # ------------------------------------------------------------------
    def _prefix(self, params, obs):
        """-> (embeds [B,Np,D], valid [B,Np])."""
        c = self.cfg
        img = vit_encode(params["vit"], self.vit_cfg, obs[c.image_key])
        if self.vit_cfg.cls_token:
            img = img[:, 1:]
        if self.vit2_cfg is not None:
            img2 = vit_encode(params["vit2"], self.vit2_cfg, obs[c.image_key])
            if self.vit2_cfg.cls_token:
                img2 = img2[:, 1:]
            img = jnp.concatenate([img, img2], axis=-1)
        # exact erf-GELU: matches the torch prismatic projector so imported
        # checkpoints stay bit-faithful (tests/test_vla_torch_parity.py)
        img = _mlp_apply(
            params["img_proj"], img,
            activation=lambda x: jax.nn.gelu(x, approximate=False),
        )
        B, Ni = img.shape[:2]
        toks, valid = [img], [jnp.ones((B, Ni), bool)]
        if c.text_key in obs:
            txt_ids = obs[c.text_key]
            toks.append(params["vlm"]["embed"][txt_ids].astype(jnp.float32))
            valid.append(
                obs.get(c.text_mask_key,
                        jnp.ones(txt_ids.shape, bool)).astype(bool)
            )
        return jnp.concatenate(toks, axis=1), jnp.concatenate(valid, axis=1)

    def _bin_logprobs(self, hidden: jax.Array, params) -> jax.Array:
        """fp32 log-softmax over the bin slice of the vocab. hidden [..., D]."""
        from rlinf_tpu.models.llm.quant import QTensor

        w = lm_head_weight(params["vlm"], self.vlm_cfg)
        if isinstance(w, QTensor):
            # int8 serving trunk: dequantize only the 256-bin vocab slice
            w = (w.q[:, self._bin_base:].astype(jnp.float32)
                 * w.scale[:, self._bin_base:].astype(jnp.float32))
        else:
            w = w[:, self._bin_base:].astype(jnp.float32)
        logits = hidden.astype(jnp.float32) @ w
        return jax.nn.log_softmax(logits, axis=-1)

    # ------------------------------------------------------------------
    def value(self, params, obs):
        embeds, valid = self._prefix(params, obs)
        hidden, _ = forward_hidden(
            params["vlm"], self.vlm_cfg, None,
            inputs_embeds=embeds, attention_mask=valid,
        )
        pooled = jnp.sum(
            hidden.astype(jnp.float32) * valid[..., None], axis=1
        ) / jnp.maximum(jnp.sum(valid, axis=1)[:, None], 1)
        return _mlp_apply(params["value_head"], pooled)[..., 0]

    # Policy interface ---------------------------------------------------
    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        """actions: [B, action_dim] BIN indices (float or int)."""
        c = self.cfg
        bins = jnp.clip(actions.astype(jnp.int32), 0, c.action_bins - 1)
        tok = self._bin_base + bins  # [B, A]
        embeds, valid = self._prefix(params, obs)
        B, Np, D = embeds.shape
        act_emb = params["vlm"]["embed"][tok].astype(embeds.dtype)
        seq = jnp.concatenate([embeds, act_emb], axis=1)
        seq_valid = jnp.concatenate(
            [valid, jnp.ones((B, c.action_dim), bool)], axis=1
        )
        hidden, _ = forward_hidden(
            params["vlm"], self.vlm_cfg, None,
            inputs_embeds=seq, attention_mask=seq_valid,
        )
        # hidden at index Np-1+j predicts action token j
        pred_h = hidden[:, Np - 1: Np - 1 + c.action_dim, :]  # [B, A, D]
        lp_all = self._bin_logprobs(pred_h, params)            # [B, A, bins]
        lp = jnp.take_along_axis(lp_all, bins[..., None], axis=-1)[..., 0]
        probs = jnp.exp(lp_all)
        entropy = -jnp.sum(probs * lp_all, axis=-1)            # [B, A]
        pooled = jnp.sum(
            hidden[:, :Np].astype(jnp.float32) * valid[..., None], axis=1
        ) / jnp.maximum(jnp.sum(valid, axis=1)[:, None], 1)
        return {
            "logprobs": lp,
            "entropy": entropy,
            "values": _mlp_apply(params["value_head"], pooled)[..., 0],
        }

    def predict_action_batch(
        self, params, rng, obs, *, deterministic: bool = False
    ) -> PolicyOutput:
        c, v = self.cfg, self.vlm_cfg
        embeds, valid = self._prefix(params, obs)
        B, Np, D = embeds.shape
        max_len = Np + c.action_dim
        positions = jnp.broadcast_to(jnp.arange(Np)[None], (B, Np))
        hidden, kv = forward_hidden(
            params["vlm"], v, None,
            positions=positions, attention_mask=valid,
            inputs_embeds=embeds, return_kv=True,
        )
        pad = max_len - Np
        cache = KVCache(
            k=jnp.pad(kv.k, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))),
            v=jnp.pad(kv.v, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))),
        )
        pooled = jnp.sum(
            hidden.astype(jnp.float32) * valid[..., None], axis=1
        ) / jnp.maximum(jnp.sum(valid, axis=1)[:, None], 1)
        values = _mlp_apply(params["value_head"], pooled)[..., 0]

        last_h = hidden[:, -1, :]
        keys = jax.random.split(rng, c.action_dim)

        def step(carry, inputs):
            h, cache = carry
            j, key = inputs
            lp_all = self._bin_logprobs(h, params)  # [B, bins]
            if deterministic:
                b = jnp.argmax(lp_all, axis=-1)
            else:
                b = jax.random.categorical(key, lp_all, axis=-1)
            lp = jnp.take_along_axis(lp_all, b[:, None], axis=-1)[:, 0]
            tok = self._bin_base + b
            kv_valid = jnp.concatenate(
                [valid,
                 jnp.broadcast_to(
                     jnp.arange(c.action_dim)[None] <= j, (B, c.action_dim)
                 )], axis=1
            )  # [B, max_len] incl. this token's slot
            h_next, cache = decode_step(
                params["vlm"], v, tok, cache,
                cache_index=Np + j,
                positions=jnp.full((B,), Np + j, jnp.int32),
                kv_valid=kv_valid,
            )
            return (h_next, cache), (b, lp)

        (_, _), (bins, lps) = jax.lax.scan(
            step, (last_h, cache), (jnp.arange(c.action_dim), keys)
        )
        bins = bins.T  # [B, A]
        lps = lps.T
        return PolicyOutput(
            actions=bins.astype(jnp.float32),
            logprobs=lps,
            values=values,
        )

    def env_actions(self, policy_actions: jax.Array) -> jax.Array:
        """Bin indices -> continuous actions (bin centers in [-1,1], then
        optional per-dim (low, high) de-normalization)."""
        c = self.cfg
        bins = policy_actions.astype(jnp.float32)
        centers = -1.0 + (bins + 0.5) * (2.0 / c.action_bins)
        if c.action_low is not None and c.action_high is not None:
            low = jnp.asarray(c.action_low, jnp.float32)
            high = jnp.asarray(c.action_high, jnp.float32)
            return low + (centers + 1.0) * 0.5 * (high - low)
        return centers
