"""Autoregressive generation: jitted prefill + lax.scan decode with KV cache.

TPU-native replacement for the reference's embedded SGLang/vLLM rollout
engines (reference rlinf/hybrid_engines/sglang/common/sgl_scheduler.py:52,
rlinf/workers/rollout/sglang/sglang_worker.py:409). Instead of a CUDA serving
engine in subprocesses, generation is one compiled XLA program over the mesh:
static shapes (bucketed prompt/response lengths), done-masking for finished
sequences, fp32 sampling logits.

Perf design (measured on v5e, Qwen2.5-0.5B geometry):
  * packed [B, S, Kv*Hd] KV cache + Pallas decode attention
    (ops/pallas/decode_attention.py) — the [B,S,K,D] layout tile-pads up to
    16x physical HBM traffic;
  * Gumbel-max sampling: token = argmax(logits/T + G) needs ONE pass over
    the fp32 [B, V] logits (+ a logsumexp for the logprob) where
    log_softmax + categorical needs several;
  * optional int8 weight-only decode params (models/llm/quant.py) — decode
    streams every matmul weight per step, int8 halves that.

Rollout logprobs are computed under the temperature-scaled full softmax — the
same distribution the inference worker recomputes (reference
megatron_worker.py:1173 run_inference), so collocated GRPO can skip the
recompute pass entirely.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.config import LLMConfig


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    max_new_tokens: int = 128
    temperature: float = 1.0
    top_k: int = 0          # 0 = disabled
    top_p: float = 1.0      # 1.0 = disabled
    eos_token_id: int = -1  # -1 = never stop early
    pad_token_id: int = 0
    greedy: bool = False


class GenerateOutput(NamedTuple):
    response_ids: jax.Array       # [B, N] int32 (pad after eos)
    response_logprobs: jax.Array  # [B, N] fp32 (0 after eos)
    response_mask: jax.Array      # [B, N] bool, True for generated incl. eos
    response_lengths: jax.Array   # [B] int32


def _filter_top_k(logits: jax.Array, k: int) -> jax.Array:
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _filter_top_p(logits: jax.Array, p: float) -> jax.Array:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep tokens until cumulative prob exceeds p (always keep the argmax).
    cutoff_mask = cum - probs > p
    threshold = jnp.min(
        jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits >= threshold, logits, -jnp.inf)


def sample_from_logits(
    rng: jax.Array,
    logits: jax.Array,
    sp: SamplingParams,
) -> Tuple[jax.Array, jax.Array]:
    """Sample token ids and return (ids, logprob under temperature softmax).

    logits: [B, V] fp32. Sampling uses the Gumbel-max trick —
    argmax(scaled + Gumbel) ~ Categorical(softmax(scaled)) — which is one
    elementwise pass + argmax instead of materializing log_softmax and
    running a separate categorical kernel. The returned logprob is computed
    under the UNfiltered temperature softmax (reference semantics: rollout
    logprobs are behavior-policy logprobs, sgl sampling_params analog).
    """
    logits = logits.astype(jnp.float32)
    if sp.greedy or sp.temperature == 0.0:
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        lp = jnp.take_along_axis(logits, tok[:, None], axis=-1)[:, 0] - lse
        return tok, lp

    scaled = logits / sp.temperature
    filtered = scaled
    if sp.top_k > 0:
        filtered = _filter_top_k(filtered, sp.top_k)
    if sp.top_p < 1.0:
        filtered = _filter_top_p(filtered, sp.top_p)
    g = jax.random.gumbel(rng, filtered.shape, jnp.float32)
    tok = jnp.argmax(filtered + g, axis=-1).astype(jnp.int32)
    lse = jax.nn.logsumexp(scaled, axis=-1)
    lp = jnp.take_along_axis(scaled, tok[:, None], axis=-1)[:, 0] - lse
    return tok, lp


def _fused_sampler_ok(dparams: M.Params, sp: SamplingParams) -> bool:
    """Fused lm-head+sampling kernel eligibility: int8 lm_head on TPU with
    plain temperature sampling (the serving configuration)."""
    from rlinf_tpu.models.llm.quant import QTensor

    return (
        jax.default_backend() == "tpu"
        and isinstance(dparams.get("lm_head"), QTensor)
        and sp.top_k == 0
        and sp.top_p >= 1.0
    )


def _sample_hidden(
    dparams: M.Params,
    cfg: LLMConfig,
    rng: jax.Array,
    hidden: jax.Array,      # [B, D]
    sp: SamplingParams,
    use_fused: bool,
) -> Tuple[jax.Array, jax.Array]:
    """hidden -> (token, behavior logprob), via the fused Pallas lm-head
    sampler (ops/pallas/sampler_kernel.py) or the XLA logits path."""
    if use_fused:
        from rlinf_tpu.ops.pallas.sampler_kernel import fused_lmhead_sample

        lm = dparams["lm_head"]
        seed = jax.random.bits(rng, (), "uint32").astype(jnp.int32)
        return fused_lmhead_sample(
            hidden.astype(cfg.compute_dtype), lm.q, lm.scale, seed,
            temperature=sp.temperature, greedy=sp.greedy,
        )
    logits = M.lm_head_logits(dparams, cfg, hidden)
    return sample_from_logits(rng, logits, sp)


def generate(
    params: M.Params,
    cfg: LLMConfig,
    rng: jax.Array,
    prompt_ids: jax.Array,    # [B, P] int32, LEFT-padded
    prompt_mask: jax.Array,   # [B, P] bool
    sp: SamplingParams,
    *,
    attn_impl: str = "xla",
    decode_params: Optional[M.Params] = None,
    decode_attn_impl: Optional[str] = None,
    kv_quant: str = "none",
    sampler_impl: Optional[str] = None,
    mega=None,
) -> GenerateOutput:
    """Batched generation. Jit-safe: shapes depend only on P and
    sp.max_new_tokens (callers bucket prompts; reference analog is SGLang's
    continuous batching, here amortized by large static batches).

    decode_params: optional separate (e.g. int8-quantized) params for the
    decode loop; prefill always runs on ``params``. See models/llm/quant.py
    for the RL-correctness argument.
    mega: optional (MegaPlan, MegaWeights) from
    ops/pallas/decode_megakernel.pack_decode_weights — runs the whole
    decode step as ONE pallas call (requires kv_quant="int8").
    """
    B, P = prompt_ids.shape
    N = sp.max_new_tokens
    S_max = P + N
    use_mega = mega is not None and kv_quant == "int8"
    if use_mega:
        # mega kernel constraint: cache length is a lane dim of its scale
        # stream buffers -> pad to a multiple of 128 (dead tail slots are
        # never read: the kernel masks on [starts, wp))
        S_max = -(-S_max // 128) * 128
    dparams = decode_params if decode_params is not None else params

    prompt_lens = jnp.sum(prompt_mask.astype(jnp.int32), axis=-1)  # [B]
    last_hidden, cache = M.prefill(
        params, cfg, prompt_ids, prompt_mask, S_max, attn_impl=attn_impl
    )
    kv_layers = M.packed_cache_from_stacked(cache)
    if kv_quant == "int8":
        # serving-path int8 KV (halves cache traffic; quantize-on-write
        # during decode, per-token max-abs scales — models/llm/model.py
        # decode_step_packed_q8 / ops/pallas q8 kernel)
        def _q8(kc, vc):
            kq, ks = M.quantize_packed_kv(kc)
            vq, vs = M.quantize_packed_kv(vc)
            return kq, vq, ks, vs

        kv_layers = tuple(_q8(kc, vc) for kc, vc in kv_layers)
    # Left-padded prompt: valid cache slots are the contiguous interval
    # [P - plen, P + t + 1) — exactly what the packed attention kernel takes.
    starts = P - prompt_lens

    use_fused = (
        _fused_sampler_ok(dparams, sp) if sampler_impl is None
        else sampler_impl == "fused"
    )
    rng, sub = jax.random.split(rng)
    tok0, lp0 = _sample_hidden(dparams, cfg, sub, last_hidden, sp, use_fused)

    if use_mega:
        # stack the per-layer q8 tuples into [L, ...] arrays for the
        # single-call megakernel (ops/pallas/decode_megakernel.py)
        from rlinf_tpu.ops.norm import rms_norm
        from rlinf_tpu.ops.pallas.decode_megakernel import decode_step_mega
        from rlinf_tpu.ops.rope import rope_frequencies

        plan, mweights = mega
        kv_layers = tuple(
            jnp.stack([layer[i] for layer in kv_layers])
            for i in range(4)
        )  # (kc, vc, ks, vs) each [L, B, S, ...]
        cos_tab, sin_tab = rope_frequencies(
            cfg.head_dim_, cfg.max_seq_len, cfg.rope_theta
        )

    decode_step = (
        M.decode_step_packed_q8 if kv_quant == "int8"
        else M.decode_step_packed
    )

    def step_fn(carry, t):
        rng, prev_tok, kv_layers, done = carry
        slot = P + t  # cache slot for prev_tok's kv (t starts at 0)
        pos = prompt_lens + t  # rope position of prev_tok
        if use_mega:
            kc, vc, ks, vs = kv_layers
            x0 = dparams["embed"][prev_tok].astype(cfg.compute_dtype)
            hidden, kc, vc, ks, vs = decode_step_mega(
                plan, mweights, x0, kc, vc, ks, vs, slot, pos, starts,
                cos_tab, sin_tab,
            )
            hidden = rms_norm(hidden, dparams["final_norm"], cfg.rms_eps)
            kv_layers = (kc, vc, ks, vs)
        else:
            hidden, kv_layers = decode_step(
                dparams, cfg, prev_tok, kv_layers, slot, pos,
                starts, jnp.full((B,), slot + 1, jnp.int32),
                attn_impl=decode_attn_impl,
            )
        rng, sub = jax.random.split(rng)
        tok, lp = _sample_hidden(dparams, cfg, sub, hidden, sp, use_fused)

        done = done | (prev_tok == sp.eos_token_id)
        tok = jnp.where(done, sp.pad_token_id, tok)
        lp = jnp.where(done, 0.0, lp)
        return (rng, tok, kv_layers, done), (tok, lp, ~done)

    carry = (rng, tok0, kv_layers, jnp.zeros((B,), bool))
    if N > 1:
        carry, (toks, lps, valids) = jax.lax.scan(
            step_fn, carry, jnp.arange(N - 1)
        )
        response_ids = jnp.concatenate([tok0[:, None], toks.T], axis=1)
        response_logprobs = jnp.concatenate([lp0[:, None], lps.T], axis=1)
        response_mask = jnp.concatenate(
            [jnp.ones((B, 1), bool), valids.T], axis=1
        )
    else:
        response_ids = tok0[:, None]
        response_logprobs = lp0[:, None]
        response_mask = jnp.ones((B, 1), bool)

    response_lengths = jnp.sum(response_mask.astype(jnp.int32), axis=-1)
    return GenerateOutput(
        response_ids=response_ids.astype(jnp.int32),
        response_logprobs=response_logprobs.astype(jnp.float32),
        response_mask=response_mask,
        response_lengths=response_lengths,
    )
