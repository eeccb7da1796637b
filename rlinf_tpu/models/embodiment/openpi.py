"""pi0 / pi0.5 policy family: PaliGemma-style VLM prefix + flow-matching
action expert (TPU-native re-design of the reference's openpi family,
reference rlinf/models/embodiment/openpi ~6k LoC + openpi_pytorch ~3.5k LoC).

Architecture (pi0 paper structure, re-built on this framework's blocks):

  prefix  = [image patch embeds | instruction token embeds]   (VLM weights)
  suffix  = [state token | K noisy-action tokens]             (expert weights)

  * Block-causal attention over blocks [prefix | state | actions]: full
    attention within a block, causal across blocks — expressed through the
    framework's position-based mask (``mask_positions`` = block ids).
  * The action expert is a SECOND, narrower set of transformer weights that
    shares the attention head space (same num_heads/head_dim) with the VLM:
    per layer, suffix tokens project q/k/v with expert weights and attend
    over [prefix KV | suffix KV].
  * Sampling integrates the learned velocity field; the PREFIX IS ENCODED
    ONCE and its per-layer KV reused for every denoising step — only the
    (K+1)-token suffix runs per step (the pi0 inference structure; on TPU
    this keeps the MXU busy with the big prefill matmuls and makes each flow
    step a tiny batched GEMM against cached KV).
  * RL: flow-SDE denoising MDP with exact chain logprobs
    (``flow_utils.sample_sde``) — the piRL recipe RLinf publishes pi0/pi0.5
    results with (pi_rl.rst:41-89).

pi0.5 variant (``discrete_state=True``): the proprioceptive state enters the
PREFIX as discretized bin tokens (own embedding table) instead of a
continuous suffix token, and the expert MLP gets adaptive-RMSNorm time
conditioning — mirroring the pi0.5 changes in the reference's openpi port.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.embodiment.base_policy import Policy, PolicyOutput
from rlinf_tpu.models.embodiment.flow_utils import (
    ChunkFlowChain,
    chain_entropy_like,
    chain_logprobs,
    flow_matching_loss,
    sample_ode,
    sample_sde,
    time_embed,
)
from rlinf_tpu.models.embodiment.mlp_policy import _mlp_apply, _mlp_init
from rlinf_tpu.models.embodiment.vit import ViTConfig, init_vit, vit_encode
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.model import forward_hidden
from rlinf_tpu.ops.attention import causal_attention
from rlinf_tpu.ops.norm import rms_norm
from rlinf_tpu.ops.rope import apply_rope, rope_frequencies


@dataclasses.dataclass(frozen=True)
class Pi0Config:
    action_dim: int = 7
    action_chunk: int = 8          # pi0 uses a 50-step chunk at 50Hz; scaled
    state_dim: int = 8
    expert_hidden: int = 64        # pi0: 1024 (Gemma-300M width)
    expert_ffn: int = 128          # pi0: 4096
    time_embed_dim: int = 32
    num_flow_steps: int = 8        # pi0 uses 10
    sde_noise_scale: float = 0.5
    discrete_state: bool = False   # True => pi0.5
    state_bins: int = 32           # pi0.5 state discretization
    image_key: str = "images"
    text_key: str = "instruction_ids"
    text_mask_key: str = "instruction_mask"
    state_key: str = "states"

    @staticmethod
    def pi0_full() -> "Pi0Config":
        """Published pi0 geometry (action expert 1024/4096, 10 flow steps,
        50-step action chunks at action_dim 32)."""
        return Pi0Config(
            action_dim=32, action_chunk=50, state_dim=32,
            expert_hidden=1024, expert_ffn=4096, num_flow_steps=10,
        )


class Pi0Policy(Policy):
    """pi0/pi0.5 with this framework's LLM as the VLM trunk.

    ``vlm_cfg`` sets the prefix trunk (PaliGemma's Gemma-2B in the real
    model; any LLMConfig here — HF Gemma/Qwen weights import through
    ``models/llm/hf_import.py``). The expert shares num_heads / num_kv_heads
    / head_dim with the VLM.
    """

    def __init__(
        self,
        cfg: Pi0Config = Pi0Config(),
        vlm_cfg: Optional[LLMConfig] = None,
        vit_cfg: Optional[ViTConfig] = None,
        remat: bool = False,
        unroll_layers: bool = False,
    ):
        #: rematerialize trunk+ViT layers in training backward passes —
        #: required to fit full-geometry (3B-prefix) PPO on one 16GB chip
        self.remat = remat
        #: python-unroll the trunk/ViT layer loops: avoids XLA's hoisted
        #: whole-stack weight transposes in scan backwards (GBs at 2B+)
        self.unroll_layers = unroll_layers
        self.cfg = cfg
        self.vlm_cfg = vlm_cfg or LLMConfig.tiny(vocab_size=256, max_seq_len=512)
        self.vit_cfg = vit_cfg or ViTConfig(
            image_size=32, patch_size=16, hidden=64, layers=1, heads=4
        )
        self.action_dim = cfg.action_dim * cfg.action_chunk

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict:
        from rlinf_tpu.models.llm.model import init_params as init_llm

        c, v = self.cfg, self.vlm_cfg
        De, Fe, L = c.expert_hidden, c.expert_ffn, v.num_layers
        keys = jax.random.split(rng, 12)
        init = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.02
        params = {
            "vit": init_vit(self.vit_cfg, keys[0]),
            "img_proj": _mlp_init(keys[1], (self.vit_cfg.hidden, v.hidden_size),
                                  scale_last=None),
            "vlm": init_llm(v, keys[2]),
            "expert": {
                "attn_norm": jnp.ones((L, De), jnp.float32),
                "wq": init(keys[3], (L, De, v.q_dim)),
                "wk": init(keys[4], (L, De, v.kv_dim)),
                "wv": init(keys[5], (L, De, v.kv_dim)),
                "wo": init(keys[6], (L, v.q_dim, De)),
                "mlp_norm": jnp.ones((L, De), jnp.float32),
                "gate": init(keys[7], (L, De, Fe)),
                "up": init(keys[8], (L, De, Fe)),
                "down": init(keys[9], (L, Fe, De)),
                "final_norm": jnp.ones((De,), jnp.float32),
            },
            "action_in": _mlp_init(
                keys[10], (c.action_dim + c.time_embed_dim, De, De),
                scale_last=None,
            ),
            "action_out": _mlp_init(keys[11], (De, c.action_dim), scale_last=0.01),
        }
        k_extra = jax.random.split(keys[0], 4)
        params["value_head"] = _mlp_init(k_extra[0], (v.hidden_size, 1),
                                         scale_last=1.0)
        if c.discrete_state:
            params["state_embed"] = init(
                k_extra[1], (c.state_bins, v.hidden_size)
            )
            params["time_ada"] = _mlp_init(
                k_extra[2], (c.time_embed_dim, De), scale_last=0.0
            )
        else:
            params["state_proj"] = _mlp_init(
                k_extra[3], (c.state_dim, De), scale_last=None
            )
        return params

    # ------------------------------------------------------------------
    # Prefix (VLM) encode — once per observation
    # ------------------------------------------------------------------
    def encode_prefix(self, params, obs):
        """-> (prefix_k [L,B,Np,K,Hd], prefix_v, prefix_valid [B,Np],
        prefix_len [B], pooled [B,Dv])."""
        c, v = self.cfg, self.vlm_cfg
        img = vit_encode(
            params["vit"], self.vit_cfg, obs[c.image_key], remat=self.remat,
            unroll=self.unroll_layers,
        )
        img = _mlp_apply([params["img_proj"][0]], img)  # [B, Ni, Dv]
        B, Ni = img.shape[:2]
        toks = [img]
        valid = [jnp.ones((B, Ni), bool)]
        if c.text_key in obs:
            txt_ids = obs[c.text_key]
            toks.append(params["vlm"]["embed"][txt_ids].astype(jnp.float32))
            valid.append(
                obs.get(c.text_mask_key,
                        jnp.ones(txt_ids.shape, bool)).astype(bool)
            )
        if c.discrete_state:
            # pi0.5: state discretized into the prefix
            s = jnp.clip(obs[c.state_key].astype(jnp.float32), -1.0, 1.0)
            bins = jnp.clip(
                ((s + 1.0) * 0.5 * c.state_bins).astype(jnp.int32),
                0, c.state_bins - 1,
            )
            toks.append(params["state_embed"][bins])
            valid.append(jnp.ones(bins.shape, bool))
        embeds = jnp.concatenate(toks, axis=1)
        pvalid = jnp.concatenate(valid, axis=1)
        Np = embeds.shape[1]
        positions = jnp.broadcast_to(jnp.arange(Np)[None], (B, Np))
        hidden, kv = forward_hidden(
            params["vlm"], v, None,
            positions=positions,
            attention_mask=pvalid,
            inputs_embeds=embeds,
            mask_positions=jnp.zeros((B, Np), jnp.int32),  # bidirectional
            return_kv=True,
            remat=self.remat,
            unroll_layers=self.unroll_layers,
        )
        pooled = jnp.sum(
            hidden.astype(jnp.float32) * pvalid[..., None], axis=1
        ) / jnp.maximum(jnp.sum(pvalid, axis=1)[:, None], 1)
        prefix_len = jnp.sum(pvalid, axis=1).astype(jnp.int32)
        return kv.k, kv.v, pvalid, prefix_len, pooled

    # ------------------------------------------------------------------
    # Suffix (action expert) pass — per flow step
    # ------------------------------------------------------------------
    def _suffix_tokens(self, params, obs, x_t, t):
        """Build suffix token embeddings [B, Ns, De] + block ids [Ns]."""
        c = self.cfg
        B = x_t.shape[0]
        temb = time_embed(t.astype(jnp.float32), c.time_embed_dim)  # [B, Te]
        act_in = jnp.concatenate(
            [x_t.astype(jnp.float32),
             jnp.broadcast_to(temb[:, None, :], (B, c.action_chunk, c.time_embed_dim))],
            axis=-1,
        )
        act_tok = _mlp_apply(params["action_in"], act_in,
                             activation=jax.nn.swish)  # [B, K, De]
        if c.discrete_state:
            toks = act_tok
            block = jnp.full((c.action_chunk,), 2, jnp.int32)
        else:
            state_tok = _mlp_apply(
                [params["state_proj"][0]], obs[c.state_key].astype(jnp.float32)
            )[:, None, :]
            toks = jnp.concatenate([state_tok, act_tok], axis=1)
            block = jnp.concatenate(
                [jnp.ones((1,), jnp.int32),
                 jnp.full((c.action_chunk,), 2, jnp.int32)]
            )
        return toks, block, temb

    def _expert_pass(self, params, prefix_k, prefix_v, prefix_valid,
                     prefix_len, obs, x_t, t):
        """Velocity v(x_t, t | prefix): expert suffix attending over cached
        prefix KV. x_t [B, K, A], t [B] -> [B, K, A]."""
        c = self.cfg
        x, block, temb = self._suffix_tokens(params, obs, x_t, t)
        ada = None
        if c.discrete_state:
            ada = 1.0 + _mlp_apply(params["time_ada"], temb)[:, None, :]
        x = self._suffix_hidden(
            params, prefix_k, prefix_v, prefix_valid, prefix_len,
            x, block, ada,
        )
        act_hidden = x[:, -c.action_chunk:, :]
        return _mlp_apply(params["action_out"], act_hidden)  # [B, K, A]

    def _suffix_hidden(self, params, prefix_k, prefix_v, prefix_valid,
                       prefix_len, x, block, ada=None):
        """Run suffix tokens ``x`` [B, Ns, De] (block ids ``block`` [Ns])
        through the expert layers attending over the cached prefix KV;
        returns the final-norm hidden states [B, Ns, De]. Shared by the
        flow action expert and the RECAP-style value expert
        (models/embodiment/value_critic.py)."""
        v = self.vlm_cfg
        ex = params["expert"]
        B, Ns, De = x.shape
        Np = prefix_k.shape[2]
        Hd = v.head_dim_

        cos, sin = rope_frequencies(Hd, v.max_seq_len, v.rope_theta)
        pos = prefix_len[:, None] + jnp.arange(Ns)[None, :]  # [B, Ns]
        # block-causal mask coordinates: prefix block 0, suffix blocks 1/2
        mq = jnp.broadcast_to(block[None], (B, Ns))
        mkv = jnp.concatenate(
            [jnp.zeros((B, Np), jnp.int32), mq], axis=1
        )
        kvalid = jnp.concatenate(
            [prefix_valid, jnp.ones((B, Ns), bool)], axis=1
        )

        def layer_fn(x, inputs):
            layer, pk, pv = inputs
            h = rms_norm(x, layer["attn_norm"], v.rms_eps)
            q = (h @ layer["wq"]).reshape(B, Ns, v.num_heads, Hd)
            k = (h @ layer["wk"]).reshape(B, Ns, v.num_kv_heads, Hd)
            vv = (h @ layer["wv"]).reshape(B, Ns, v.num_kv_heads, Hd)
            q, k = apply_rope(q, k, cos, sin, pos)
            k_all = jnp.concatenate([pk, k], axis=1)
            v_all = jnp.concatenate([pv, vv], axis=1)
            attn = causal_attention(
                q, k_all, v_all,
                positions_q=mq, positions_kv=mkv, kv_valid_mask=kvalid,
            )
            x = x + attn.reshape(B, Ns, v.q_dim) @ layer["wo"]
            h = rms_norm(x, layer["mlp_norm"], v.rms_eps)
            if ada is not None:
                h = h * ada  # pi0.5 adaptive time conditioning
            x = x + (jax.nn.silu(h @ layer["gate"]) * (h @ layer["up"])) @ layer["down"]
            return x, None

        x, _ = jax.lax.scan(layer_fn, x, (
            {k_: ex[k_] for k_ in
             ("attn_norm", "wq", "wk", "wv", "wo", "mlp_norm",
              "gate", "up", "down")},
            prefix_k, prefix_v,
        ))
        return rms_norm(x, ex["final_norm"], v.rms_eps)

    def _velocity_fn(self, params, obs):
        """Closure (x_t, t) -> v with the prefix encoded ONCE."""
        pk, pv, pvalid, plen, pooled = self.encode_prefix(params, obs)
        fn = lambda x_t, t: self._expert_pass(
            params, pk, pv, pvalid, plen, obs, x_t, t
        )
        return fn, pooled

    # ------------------------------------------------------------------
    def value(self, params, obs):
        _, _, _, _, pooled = self.encode_prefix(params, obs)
        return _mlp_apply(params["value_head"], pooled)[..., 0]

    def flow_matching_loss(self, params, rng, obs, target_actions):
        """BC/SFT loss; target_actions [B, K, A] or [B, K*A]."""
        c = self.cfg
        target = target_actions.reshape(-1, c.action_chunk, c.action_dim)
        fn, _ = self._velocity_fn(params, obs)
        return flow_matching_loss(fn, rng, target)

    def sample_ode(self, params, rng, obs, *, steps: Optional[int] = None):
        c = self.cfg
        B = obs[c.image_key].shape[0]
        fn, _ = self._velocity_fn(params, obs)
        return sample_ode(fn, rng, (B, c.action_chunk, c.action_dim),
                          steps=steps or c.num_flow_steps)

    # Policy interface ---------------------------------------------------
    def default_forward(self, params, obs, actions) -> Dict[str, jax.Array]:
        """actions: flattened chain [B, (S+1)*K*A] (flow-SDE denoising MDP)."""
        c = self.cfg
        B = actions.shape[0]
        chain = actions.astype(jnp.float32).reshape(
            B, -1, c.action_chunk, c.action_dim
        )
        fn, pooled = self._velocity_fn(params, obs)
        lp = chain_logprobs(fn, chain, noise_scale=c.sde_noise_scale,
                            remat=self.remat)
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
            actions=out.chain.reshape(B, -1),  # chain rides along for training
            logprobs=out.logprobs,
            values=values,
        )

    def env_actions(self, policy_actions: jax.Array) -> jax.Array:
        """Extract x1 [B, K*A] from the flattened chain."""
        c = self.cfg
        B = policy_actions.shape[0]
        chain = policy_actions.reshape(B, -1, c.action_chunk, c.action_dim)
        return chain[:, -1].reshape(B, -1)
