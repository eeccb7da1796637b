"""Value-model critics: RECAP categorical critic + STEAM stride critic.

TPU-native re-designs of the reference's embodied value-model family:

* ``ValueCriticPolicy`` — RECAP's "expert forward mode" (reference
  rlinf/models/embodiment/value_model/recap/modeling_critic.py:129): the
  VLM prefix (images + language) is encoded once, a small value expert
  attends over the cached prefix KV with a single learned [CLS] suffix
  token, and the [CLS] hidden projects to a CATEGORICAL value
  distribution over ``num_bins`` atoms in [v_min, v_max]. Training uses
  the Dirac two-bin projection cross-entropy (modeling_critic.py:473) with
  the reference's acc_best / acc_neighbor / mae metrics. Built on the same
  prefix/expert machinery as pi0 (openpi.Pi0Policy._suffix_hidden) — the
  reference does exactly this (its value expert is the Gemma action
  expert reused).

* ``SteamCritic`` — STEAM's pairwise temporal-stride classifier (reference
  value_model/steam/modeling_steam.py + configuration.py:83-95): given an
  (earlier, later) frame pair, classify the SIGNED stride into an even
  number of bins (num_bins == 2 is the legacy binary progressive /
  regressive mode); an ENSEMBLE of heads (steam/ensemble_modeling_critic.py)
  over a shared ViT backbone gives per-member logits whose mean probability
  is the progress estimate.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.openpi import (
    Pi0Config,
    Pi0Policy,
    _mlp_apply,
    _mlp_init,
)
from rlinf_tpu.models.embodiment.vit import ViTConfig, init_vit, vit_encode
from rlinf_tpu.models.llm.config import LLMConfig


# ---------------------------------------------------------------------------
# Categorical (distributional) value loss — reference modeling_critic.py:473
# ---------------------------------------------------------------------------


def categorical_value_loss(
    logits: jax.Array,          # [B, num_bins]
    target_values: jax.Array,   # [B]
    *,
    v_min: float,
    v_max: float,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Dirac two-bin projection cross-entropy + the reference's metrics.

    Targets are clamped to [v_min, v_max] and projected onto the two
    neighboring atoms with linear weights; loss is -sum(p_target *
    log_softmax(logits)) per row."""
    B, num_bins = logits.shape
    delta_z = (v_max - v_min) / (num_bins - 1)
    t = jnp.clip(target_values.astype(jnp.float32), v_min, v_max)
    b = (t - v_min) / delta_z
    lo = jnp.clip(jnp.floor(b).astype(jnp.int32), 0, num_bins - 1)
    hi = jnp.clip(jnp.ceil(b).astype(jnp.int32), 0, num_bins - 1)
    d_to_l = b - lo.astype(jnp.float32)
    d_to_u = hi.astype(jnp.float32) - b
    same = lo == hi
    d_to_l = jnp.where(same, 0.0, d_to_l)
    d_to_u = jnp.where(same, 1.0, d_to_u)
    target_probs = (
        jax.nn.one_hot(lo, num_bins) * d_to_u[:, None]
        + jax.nn.one_hot(hi, num_bins) * d_to_l[:, None]
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.sum(target_probs * logp, axis=-1)

    pred_bin = jnp.argmax(logits, axis=-1)
    best = jnp.where(d_to_u >= d_to_l, lo, hi)
    acc_best = jnp.mean((pred_bin == best).astype(jnp.float32))
    acc_neighbor = jnp.mean(
        ((pred_bin == lo) | (pred_bin == hi)).astype(jnp.float32))
    min_dist = jnp.minimum(
        jnp.abs(pred_bin - lo), jnp.abs(pred_bin - hi)).astype(jnp.float32)
    mae = jnp.mean(min_dist * delta_z)
    return loss, {"critic/acc_best": acc_best,
                  "critic/acc_neighbor": acc_neighbor,
                  "critic/mae": mae}


def value_atoms(num_bins: int, v_min: float, v_max: float) -> jax.Array:
    return jnp.linspace(v_min, v_max, num_bins)


# ---------------------------------------------------------------------------
# RECAP critic
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ValueCriticConfig:
    num_bins: int = 64
    v_min: float = -1.0     # reference configuration.py:246 defaults
    v_max: float = 0.0
    expert_hidden: int = 64
    expert_ffn: int = 128


class ValueCriticPolicy(Pi0Policy):
    """RECAP critic: VLM prefix + value expert + [CLS] -> categorical value.

    Reference call stack analog: ValueCriticModel.forward ->
    embed_prefix / embed_suffix([CLS]) / _forward_expert ->
    _compute_value_from_hidden (modeling_critic.py:311-472)."""

    def __init__(self, vcfg: ValueCriticConfig = ValueCriticConfig(),
                 vlm_cfg: Optional[LLMConfig] = None,
                 vit_cfg: Optional[ViTConfig] = None, **kw):
        super().__init__(
            Pi0Config(action_chunk=1, expert_hidden=vcfg.expert_hidden,
                      expert_ffn=vcfg.expert_ffn),
            vlm_cfg=vlm_cfg, vit_cfg=vit_cfg, **kw)
        self.vcfg = vcfg

    def init(self, rng: jax.Array) -> Dict:
        params = super().init(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        De = self.vcfg.expert_hidden
        params["cls_embed"] = (
            jax.random.normal(k1, (De,), jnp.float32) * 0.02)
        params["value_logits"] = _mlp_init(
            k2, (De, self.vcfg.num_bins), scale_last=0.01)
        return params

    def value_logits(self, params, obs) -> jax.Array:
        """obs (images + instruction) -> [B, num_bins] logits."""
        pk, pv, pvalid, plen, _ = self.encode_prefix(params, obs)
        B = pk.shape[1]
        x = jnp.broadcast_to(
            params["cls_embed"][None, None, :],
            (B, 1, self.vcfg.expert_hidden),
        ).astype(jnp.float32)
        block = jnp.ones((1,), jnp.int32)  # [CLS] is its own suffix block
        h = self._suffix_hidden(params, pk, pv, pvalid, plen, x, block)
        return _mlp_apply(params["value_logits"], h[:, 0])

    def predict_value(self, params, obs) -> jax.Array:
        """Expected value under the categorical distribution [B]."""
        logits = self.value_logits(params, obs)
        probs = jax.nn.softmax(logits, axis=-1)
        atoms = value_atoms(self.vcfg.num_bins, self.vcfg.v_min,
                            self.vcfg.v_max)
        return jnp.sum(probs * atoms[None, :], axis=-1)

    def loss(self, params, obs, target_values):
        logits = self.value_logits(params, obs)
        loss, metrics = categorical_value_loss(
            logits, target_values, v_min=self.vcfg.v_min,
            v_max=self.vcfg.v_max)
        return jnp.mean(loss), metrics


# ---------------------------------------------------------------------------
# STEAM critic
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SteamConfig:
    #: even; 2 == legacy binary progressive/regressive mode
    #: (reference steam/configuration.py:83-95)
    num_bins: int = 2
    #: max pair stride K; signed strides in [-K, K] \ {0} discretize into
    #: num_bins (first half regressive, second half progressive)
    max_stride: int = 8
    ensemble_size: int = 4
    feature_dim: int = 128

    def __post_init__(self):
        if self.num_bins < 2 or self.num_bins % 2:
            raise ValueError(
                f"num_bins must be >= 2 and even, got {self.num_bins}")


class SteamCritic:
    """Pairwise temporal-stride ensemble critic."""

    def __init__(self, cfg: SteamConfig = SteamConfig(),
                 vit_cfg: Optional[ViTConfig] = None):
        self.cfg = cfg
        self.vit_cfg = vit_cfg or ViTConfig(
            image_size=32, patch_size=16, hidden=64, layers=1, heads=4)

    def init(self, rng: jax.Array) -> Dict:
        c = self.cfg
        k0, k1, k2 = jax.random.split(rng, 3)
        E = c.ensemble_size
        D = self.vit_cfg.hidden
        heads = jax.vmap(
            lambda k: _mlp_init(
                k, (2 * D, c.feature_dim, c.num_bins), scale_last=0.01)
        )(jax.random.split(k2, E))
        return {"vit": init_vit(self.vit_cfg, k0), "heads": heads}

    def _pair_features(self, params, frames_a, frames_b):
        fa = vit_encode(params["vit"], self.vit_cfg, frames_a).mean(axis=1)
        fb = vit_encode(params["vit"], self.vit_cfg, frames_b).mean(axis=1)
        return jnp.concatenate([fa, fb], axis=-1)  # [B, 2D]

    def stride_logits(self, params, frames_a, frames_b) -> jax.Array:
        """-> [E, B, num_bins] per-member logits (ensemble axis leading,
        reference ensemble_modeling_critic.py:65)."""
        feat = self._pair_features(params, frames_a, frames_b)
        return jax.vmap(lambda h: _mlp_apply(h, feat))(params["heads"])

    def stride_to_bin(self, strides: jax.Array) -> jax.Array:
        """Signed strides in [-K, K] \\ {0} -> bin ids [0, num_bins)."""
        c = self.cfg
        if c.num_bins == 2:
            return (strides > 0).astype(jnp.int32)
        half = c.num_bins // 2
        mag = jnp.clip(jnp.abs(strides), 1, c.max_stride)
        sub = jnp.ceil(mag * half / c.max_stride).astype(jnp.int32) - 1
        return jnp.where(strides > 0, half + sub, half - 1 - sub)

    def loss(self, params, frames_a, frames_b, strides):
        """Mean cross-entropy over ensemble members + accuracy metric."""
        logits = self.stride_logits(params, frames_a, frames_b)  # [E,B,nb]
        bins = self.stride_to_bin(strides)                       # [B]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(
            logp, bins[None, :, None], axis=-1)[..., 0]          # [E, B]
        probs = jax.nn.softmax(logits, axis=-1).mean(0)          # [B, nb]
        acc = jnp.mean((jnp.argmax(probs, -1) == bins).astype(jnp.float32))
        return jnp.mean(nll), {"critic/stride_acc": acc}

    def progress_score(self, params, frames_a, frames_b) -> jax.Array:
        """Mean ensemble probability mass on the progressive half [B] —
        STEAM's progress/value signal."""
        logits = self.stride_logits(params, frames_a, frames_b)
        probs = jax.nn.softmax(logits, axis=-1).mean(0)
        return jnp.sum(probs[:, self.cfg.num_bins // 2:], axis=-1)

    def ensemble_disagreement(self, params, frames_a, frames_b) -> jax.Array:
        """Std of the per-member progressive mass [B] (epistemic signal)."""
        logits = self.stride_logits(params, frames_a, frames_b)
        probs = jax.nn.softmax(logits, axis=-1)
        prog = jnp.sum(probs[..., self.cfg.num_bins // 2:], axis=-1)  # [E,B]
        return jnp.std(prog, axis=0)
