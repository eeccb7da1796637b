"""Vision-language reasoning model: ViT prefix + causal LM, free-form text.

The reference runs GRPO on vision-language reasoning (VLM e2e configs under
reference tests/e2e_tests/ and the VLM SFT worker
rlinf/workers/sft/megatron_vlm_sft_worker.py): the model consumes
[image | question] and generates a free-text answer that a VQA-style reward
grades. This is the TPU-native analog, assembled from the framework's parts:

  * ViT patch encoder (models/embodiment/vit.py — timm-style optional) +
    MLP projector into the decoder's embedding space (prismatic layout);
  * causal decoder (models/llm) prefilled on the multimodal prefix via
    ``inputs_embeds``, then autoregressive free-vocab decode with the
    framework sampler (Gumbel-max, temperature/top-k/top-p, eos) — one
    ``lax.scan``, KV-cached, no per-step recompile;
  * teacher-forced ``forward`` for PPO ratios (fp32 logprobs + entropy over
    the response tokens only).

Unlike OpenVLA (action-bin tokens), generation spans the FULL vocabulary —
this is the chat/VQA surface, not the robot surface.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init
from rlinf_tpu.models.embodiment.vit import ViTConfig, init_vit, vit_encode
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.model import (
    KVCache,
    decode_step,
    forward_hidden,
    init_params as init_llm,
    lm_head_weight,
)
from rlinf_tpu.models.llm.sampler import SamplingParams, sample_from_logits


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    image_key: str = "images"


class VLMReasoningModel:
    def __init__(
        self,
        vlm_cfg: Optional[LLMConfig] = None,
        vit_cfg: Optional[ViTConfig] = None,
        cfg: VLMConfig = VLMConfig(),
    ):
        self.cfg = cfg
        self.vlm_cfg = vlm_cfg or LLMConfig.tiny(vocab_size=260, max_seq_len=256)
        self.vit_cfg = vit_cfg or ViTConfig(
            image_size=32, patch_size=16, hidden=64, layers=2, heads=4
        )

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "vit": init_vit(self.vit_cfg, k1),
            "img_proj": _mlp_init(
                k2,
                (self.vit_cfg.hidden, self.vlm_cfg.hidden_size,
                 self.vlm_cfg.hidden_size),
                scale_last=None,
            ),
            "vlm": init_llm(self.vlm_cfg, k3),
        }

    def _prefix(
        self, params, images, prompt_ids, prompt_mask
    ) -> Tuple[jax.Array, jax.Array]:
        """[image patches | question tokens] -> (embeds [B,Np,D], valid)."""
        img = vit_encode(params["vit"], self.vit_cfg, images)
        if self.vit_cfg.cls_token:
            img = img[:, 1:]
        img = _mlp_apply(params["img_proj"], img, activation=jax.nn.gelu)
        B, Ni = img.shape[:2]
        txt = params["vlm"]["embed"][prompt_ids].astype(img.dtype)
        embeds = jnp.concatenate([img, txt], axis=1)
        valid = jnp.concatenate(
            [jnp.ones((B, Ni), bool), prompt_mask.astype(bool)], axis=1
        )
        return embeds, valid

    # ------------------------------------------------------------------
    def generate(
        self, params, rng, images, prompt_ids, prompt_mask, sp: SamplingParams
    ) -> Dict[str, jax.Array]:
        """Prefill the multimodal prefix, decode ``sp.max_new_tokens``.

        Returns response_ids/logprobs/mask/lengths ([B, N]); mask goes False
        after eos (eos itself included), logprobs are behavior logprobs
        under the temperature softmax (reference rollout semantics).
        """
        v = self.vlm_cfg
        embeds, valid = self._prefix(params, images, prompt_ids, prompt_mask)
        B, Np, D = embeds.shape
        N = sp.max_new_tokens
        max_len = Np + N
        positions = jnp.broadcast_to(jnp.arange(Np)[None], (B, Np))
        hidden, kv = forward_hidden(
            params["vlm"], v, None,
            positions=positions, attention_mask=valid,
            inputs_embeds=embeds, return_kv=True,
        )
        cache = KVCache(
            k=jnp.pad(kv.k, ((0, 0), (0, 0), (0, N), (0, 0), (0, 0))),
            v=jnp.pad(kv.v, ((0, 0), (0, 0), (0, N), (0, 0), (0, 0))),
        )
        w = lm_head_weight(params["vlm"], v)
        last_h = hidden[:, -1, :]
        keys = jax.random.split(rng, N)

        def step(carry, inputs):
            h, cache, alive = carry
            j, key = inputs
            logits = (h.astype(jnp.float32) @ w.astype(jnp.float32))
            tok, lp = sample_from_logits(key, logits, sp)
            tok = jnp.where(alive, tok, sp.pad_token_id)
            lp = jnp.where(alive, lp, 0.0)
            emitted = alive
            alive = alive & (tok != sp.eos_token_id)
            kv_valid = jnp.concatenate(
                [valid,
                 jnp.broadcast_to(jnp.arange(N)[None] <= j, (B, N))], axis=1
            )
            h_next, cache = decode_step(
                params["vlm"], v, tok, cache,
                cache_index=Np + j,
                positions=jnp.full((B,), Np + j, jnp.int32),
                kv_valid=kv_valid,
            )
            return (h_next, cache, alive), (tok, lp, emitted)

        alive0 = jnp.ones((B,), bool)
        (_, _, _), (toks, lps, emitted) = jax.lax.scan(
            step, (last_h, cache, alive0), (jnp.arange(N), keys)
        )
        return {
            "response_ids": toks.T.astype(jnp.int32),       # [B, N]
            "response_logprobs": lps.T.astype(jnp.float32),
            "response_mask": emitted.T,
            "response_lengths": jnp.sum(emitted.T, axis=1).astype(jnp.int32),
        }

    # ------------------------------------------------------------------
    def forward(
        self, params, images, prompt_ids, prompt_mask, response_ids,
        response_mask, *, temperature: float = 1.0,
    ) -> Tuple[jax.Array, jax.Array]:
        """Teacher-forced fp32 (logprobs, entropy) of the response tokens
        [B, N] given the multimodal prefix — the PPO-ratio forward."""
        v = self.vlm_cfg
        embeds, valid = self._prefix(params, images, prompt_ids, prompt_mask)
        B, Np, D = embeds.shape
        N = response_ids.shape[1]
        resp_emb = params["vlm"]["embed"][response_ids].astype(embeds.dtype)
        seq = jnp.concatenate([embeds, resp_emb], axis=1)
        seq_valid = jnp.concatenate(
            [valid, response_mask.astype(bool)], axis=1
        )
        hidden, _ = forward_hidden(
            params["vlm"], v, None, inputs_embeds=seq,
            attention_mask=seq_valid,
        )
        w = lm_head_weight(params["vlm"], v)
        pred_h = hidden[:, Np - 1: Np - 1 + N, :]
        logits = (
            pred_h.astype(jnp.float32) @ w.astype(jnp.float32)
        ) / temperature
        lp_all = jax.nn.log_softmax(logits, axis=-1)
        lp = jnp.take_along_axis(
            lp_all, response_ids[..., None], axis=-1
        )[..., 0]
        probs = jnp.exp(lp_all)
        entropy = -jnp.sum(probs * lp_all, axis=-1)
        return lp, entropy
