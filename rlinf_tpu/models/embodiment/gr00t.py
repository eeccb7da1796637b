"""GR00T-style policy: VLM features + flow-matching DiT action head.

TPU-native re-design of the reference's gr00t N1.5/N1.6/N1.7 family
(reference rlinf/models/embodiment/gr00t ~3.3k LoC): an Eagle-VLM backbone
produces vision-language tokens; a diffusion-transformer (DiT) action head
denoises an action CHUNK conditioned on those tokens, the proprioceptive
state, and a per-EMBODIMENT embedding (GR00T's multi-embodiment design).

Structure here:
  * Backbone: ViT patch tokens (+ optional instruction token embeds through a
    small embedding table), projected to the DiT width. Computed ONCE per
    observation; every denoising step only runs the small DiT head —
    the same prefix-reuse structure as pi0 (cheap flow steps on TPU).
  * State encoder: MLP(state) + embodiment-category embedding (the N1.5
    per-embodiment encoder, collapsed to an additive embedding).
  * DiT head: stacked blocks of [adaLN self-attention over
    (state tok | K action toks)] -> [cross-attention to backbone tokens] ->
    [adaLN MLP], with per-layer adaLN-zero modulation from the flow time t.
  * Training: conditional flow matching (BC) — ``flow_matching_loss``.
    RL: flow-SDE denoising MDP with exact chain logprobs (same piRL
    construction as openpi; shared ``flow_utils``).

starvla's flow-matching action head (reference rlinf/models/embodiment/
starvla/action_heads/flowmatching.py) is this same DiT-over-chunk design
without the embodiment embedding — exposed via ``num_embodiments=1``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.flow_utils import (
    chain_entropy_like,
    chain_logprobs,
    flow_matching_loss,
    sample_ode,
    sample_sde,
    time_embed,
)
from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init
from rlinf_tpu.models.embodiment.vit import ViTConfig, init_vit, vit_encode
from rlinf_tpu.ops.attention import causal_attention
from rlinf_tpu.ops.norm import rms_norm


@dataclasses.dataclass(frozen=True)
class GR00TConfig:
    action_dim: int = 7
    action_chunk: int = 8          # N1.5 denoises 16-step chunks
    state_dim: int = 8
    num_embodiments: int = 4       # GR00T embodiment categories
    hidden: int = 64               # DiT width (N1.5: 1024)
    layers: int = 2                # DiT depth (N1.5: 16)
    heads: int = 4
    mlp_ratio: int = 4
    text_vocab: int = 0            # 0 => vision-only conditioning
    time_embed_dim: int = 32
    num_flow_steps: int = 8
    sde_noise_scale: float = 0.5
    image_key: str = "images"
    text_key: str = "instruction_ids"
    state_key: str = "states"
    embodiment_key: str = "embodiment_id"


class GR00TPolicy(Policy):
    def __init__(self, cfg: GR00TConfig = GR00TConfig(),
                 vit_cfg: Optional[ViTConfig] = None):
        self.cfg = cfg
        self.vit_cfg = vit_cfg or ViTConfig(
            image_size=32, patch_size=16, hidden=64, layers=1, heads=4
        )
        self.action_dim = cfg.action_dim * cfg.action_chunk

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict:
        c = self.cfg
        D, L, F = c.hidden, c.layers, c.hidden * c.mlp_ratio
        keys = jax.random.split(rng, 17)
        init = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.02
        params = {
            "vit": init_vit(self.vit_cfg, keys[0]),
            "img_proj": _mlp_init(keys[1], (self.vit_cfg.hidden, D),
                                  scale_last=None),
            "state_enc": _mlp_init(keys[2], (c.state_dim, D, D),
                                   scale_last=None),
            "embodiment_embed": init(keys[3], (c.num_embodiments, D)),
            "action_in": _mlp_init(keys[4], (c.action_dim, D), scale_last=None),
            "action_pos": init(keys[5], (c.action_chunk, D)),
            "dit": {
                "norm1": jnp.ones((L, D), jnp.float32),
                "wqkv": init(keys[6], (L, D, 3 * D)),
                "wo": init(keys[7], (L, D, D)),
                "xnorm": jnp.ones((L, D), jnp.float32),
                "xq": init(keys[8], (L, D, D)),
                "xkv": init(keys[9], (L, D, 2 * D)),
                "xo": init(keys[10], (L, D, D)),
                "norm2": jnp.ones((L, D), jnp.float32),
                "w1": init(keys[11], (L, D, F)),
                "w2": init(keys[12], (L, F, D)),
                # adaLN: 6 chunks (shift/scale/gate for attn + mlp); small
                # random init (not adaLN-zero) so gates pass signal at init —
                # the state/embodiment token conditions actions from step 0
                "ada": init(keys[16], (L, c.time_embed_dim, 6 * D)),
            },
            "final_norm": jnp.ones((D,), jnp.float32),
            "action_out": _mlp_init(keys[13], (D, c.action_dim),
                                    scale_last=0.01),
            "value_head": _mlp_init(keys[14], (D, 1), scale_last=1.0),
        }
        if c.text_vocab:
            params["text_embed"] = init(keys[15], (c.text_vocab, D))
        return params

    # ------------------------------------------------------------------
    def encode_backbone(self, params, obs):
        """-> (cond tokens [B, N, D], pooled [B, D])."""
        c = self.cfg
        img = vit_encode(params["vit"], self.vit_cfg, obs[c.image_key])
        feats = _mlp_apply(params["img_proj"], img)
        if c.text_vocab and c.text_key in obs:
            txt = params["text_embed"][obs[c.text_key]]
            feats = jnp.concatenate([feats, txt], axis=1)
        return feats, jnp.mean(feats, axis=1)

    def _dit_pass(self, params, cond, state_tok, x_t, t):
        """x_t [B, K, A], t [B] -> velocity [B, K, A]."""
        c = self.cfg
        B = x_t.shape[0]
        D, Hn = c.hidden, c.heads
        Hd = D // Hn
        act = _mlp_apply(params["action_in"], x_t.astype(jnp.float32))
        act = act + params["action_pos"][None]
        x = jnp.concatenate([state_tok[:, None, :], act], axis=1)  # [B,1+K,D]
        Ns = x.shape[1]
        temb = time_embed(t.astype(jnp.float32), c.time_embed_dim)  # [B, Te]
        zero_pos = jnp.zeros((B, Ns), jnp.int32)    # full self-attention
        Nc = cond.shape[1]
        zero_pos_c = jnp.zeros((B, Nc), jnp.int32)

        def block(x, layer):
            ada = temb @ layer["ada"]  # [B, 6D]
            (s1, g1, gate1, s2, g2, gate2) = jnp.split(ada, 6, axis=-1)
            # modulated self-attention over [state | action] tokens
            h = rms_norm(x, layer["norm1"]) * (1 + g1[:, None]) + s1[:, None]
            q, k, v = jnp.split(h @ layer["wqkv"], 3, axis=-1)
            attn = causal_attention(
                q.reshape(B, Ns, Hn, Hd), k.reshape(B, Ns, Hn, Hd),
                v.reshape(B, Ns, Hn, Hd),
                positions_q=zero_pos, positions_kv=zero_pos,
            ).reshape(B, Ns, D)
            x = x + gate1[:, None] * (attn @ layer["wo"])
            # cross-attention to backbone tokens
            h = rms_norm(x, layer["xnorm"])
            q = (h @ layer["xq"]).reshape(B, Ns, Hn, Hd)
            kc, vc = jnp.split(cond @ layer["xkv"], 2, axis=-1)
            attn = causal_attention(
                q, kc.reshape(B, Nc, Hn, Hd), vc.reshape(B, Nc, Hn, Hd),
                positions_q=zero_pos, positions_kv=zero_pos_c,
            ).reshape(B, Ns, D)
            x = x + attn @ layer["xo"]
            # modulated MLP
            h = rms_norm(x, layer["norm2"]) * (1 + g2[:, None]) + s2[:, None]
            x = x + gate2[:, None] * (jax.nn.gelu(h @ layer["w1"]) @ layer["w2"])
            return x, None

        x, _ = jax.lax.scan(block, x, params["dit"])
        x = rms_norm(x, params["final_norm"])
        return _mlp_apply(params["action_out"], x[:, 1:, :])

    def _velocity_fn(self, params, obs):
        c = self.cfg
        cond, pooled = self.encode_backbone(params, obs)
        state_tok = _mlp_apply(params["state_enc"],
                               obs[c.state_key].astype(jnp.float32),
                               activation=jax.nn.swish)
        B = state_tok.shape[0]
        emb_id = obs.get(c.embodiment_key, jnp.zeros((B,), jnp.int32))
        state_tok = state_tok + params["embodiment_embed"][
            emb_id.astype(jnp.int32)
        ]
        fn = lambda x_t, t: self._dit_pass(params, cond, state_tok, x_t, t)
        return fn, pooled

    # ------------------------------------------------------------------
    def value(self, params, obs):
        _, pooled = self.encode_backbone(params, obs)
        return _mlp_apply(params["value_head"], pooled)[..., 0]

    def flow_matching_loss(self, params, rng, obs, target_actions):
        c = self.cfg
        target = target_actions.reshape(-1, c.action_chunk, c.action_dim)
        fn, _ = self._velocity_fn(params, obs)
        return flow_matching_loss(fn, rng, target)

    # Policy interface ---------------------------------------------------
    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        c = self.cfg
        B = actions.shape[0]
        chain = actions.astype(jnp.float32).reshape(
            B, -1, c.action_chunk, c.action_dim
        )
        fn, pooled = self._velocity_fn(params, obs)
        lp = chain_logprobs(fn, chain, noise_scale=c.sde_noise_scale)
        ent = chain_entropy_like(
            lp, c.action_chunk * c.action_dim, chain.shape[1] - 1,
            c.sde_noise_scale,
        )
        return {
            "logprobs": lp,
            "entropy": ent,
            "values": _mlp_apply(params["value_head"], pooled)[..., 0],
        }

    def predict_action_batch(
        self, params, rng, obs, *, deterministic: bool = False
    ) -> PolicyOutput:
        c = self.cfg
        B = obs[c.image_key].shape[0]
        fn, pooled = self._velocity_fn(params, obs)
        values = _mlp_apply(params["value_head"], pooled)[..., 0]
        shape = (B, c.action_chunk, c.action_dim)
        if deterministic:
            x1 = sample_ode(fn, rng, shape, steps=c.num_flow_steps)
            return PolicyOutput(
                actions=x1.reshape(B, -1),
                logprobs=jnp.zeros((B, 1), jnp.float32),
                values=values,
            )
        out = sample_sde(fn, rng, shape, steps=c.num_flow_steps,
                         noise_scale=c.sde_noise_scale)
        return PolicyOutput(
            actions=out.chain.reshape(B, -1),
            logprobs=out.logprobs,
            values=values,
        )

    def env_actions(self, policy_actions: jax.Array) -> jax.Array:
        c = self.cfg
        B = policy_actions.shape[0]
        chain = policy_actions.reshape(B, -1, c.action_chunk, c.action_dim)
        return chain[:, -1].reshape(B, -1)
