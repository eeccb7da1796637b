"""Continuous-batching generation engine: slot refill + chunked decode.

TPU-native re-design of SGLang-style continuous batching (reference
rlinf/hybrid_engines/sglang — paged-KV serving with per-request scheduling;
rollout worker loop at rollout/sglang/sglang_worker.py:409). On TPU, dynamic
shapes are the enemy, so the engine keeps a FIXED pool of B slots:

  * each slot owns a cache region, a write position, and a done flag;
  * finished slots are refilled from the pending-prompt queue via a jitted
    per-slot prefill (prompt lengths bucketed);
  * decode runs K steps per host round inside one jitted ``lax.scan``
    (amortizing dispatch), with per-slot ragged write positions
    (models/llm/model.decode_step_ragged);
  * sequences exceeding their budget or hitting EOS free their slot.

Throughput win over the static batch engine: long-tail decode no longer
holds the whole batch hostage — freed slots immediately serve new prompts.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.data.io_struct import RolloutRequest, RolloutResult
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams, sample_from_logits


@dataclasses.dataclass
class _Slot:
    request_idx: int = -1         # which request occupies this slot (-1 free)
    prompt_len: int = 0
    tokens: List[int] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)


class ContinuousBatchingEngine:
    def __init__(
        self,
        cfg: LLMConfig,
        sampling: SamplingParams,
        *,
        num_slots: int = 32,
        max_seq_len: Optional[int] = None,
        prompt_bucket: int = 64,
        decode_chunk: int = 16,
    ):
        self.cfg = cfg
        self.sampling = sampling
        self.num_slots = num_slots
        self.max_seq_len = max_seq_len or cfg.max_seq_len
        self.prompt_bucket = prompt_bucket
        self.decode_chunk = decode_chunk

        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(1,))
        self._decode = jax.jit(
            self._decode_impl, donate_argnums=(1, 2, 3, 4), static_argnums=(7,)
        )

    # -- jitted internals ------------------------------------------------
    def _prefill_impl(self, params, cache, kv_valid, slot, prompt_ids, prompt_mask):
        """Prefill ONE slot: prompt [1, P] right-aligned? no — right-padded
        prompt occupying cache [0, P); returns (cache, kv_valid, last_hidden)."""
        hidden, kv = M.forward_hidden(
            params, self.cfg, prompt_ids, attention_mask=prompt_mask,
            return_kv=True,
        )
        P_len = prompt_ids.shape[1]
        # kv: [L, 1, P, K, D] -> write into cache[:, slot, :P]
        k_new = jax.lax.dynamic_update_slice(
            cache.k, kv.k, (0, slot, 0, 0, 0)
        )
        v_new = jax.lax.dynamic_update_slice(
            cache.v, kv.v, (0, slot, 0, 0, 0)
        )
        row_valid = jnp.zeros((self.max_seq_len,), bool).at[:P_len].set(
            prompt_mask[0]
        )
        kv_valid = kv_valid.at[slot].set(row_valid)
        # last real token's hidden state (prompt is right-padded); logits
        # computed INSIDE jit so the lm-head transpose isn't re-dispatched
        # per refill
        last = jnp.sum(prompt_mask[0].astype(jnp.int32)) - 1
        w_lm = M.lm_head_weight(params, self.cfg)
        logits = (hidden[0, last] @ w_lm).astype(jnp.float32)
        return M.KVCache(k_new, v_new), kv_valid, logits

    def _decode_impl(
        self, params, cache, kv_valid, write_pos, done, cur_tokens, rng, n_steps
    ):
        """K decode steps for all slots. Returns stacked tokens/logprobs."""
        w_lm = M.lm_head_weight(params, self.cfg)

        def step(carry, _):
            cache, kv_valid, write_pos, done, tok, rng = carry
            rows = jnp.arange(self.num_slots)
            kv_valid = kv_valid.at[rows, write_pos].set(
                kv_valid[rows, write_pos] | ~done
            )
            positions = jnp.sum(kv_valid.astype(jnp.int32), axis=-1) - 1
            hidden, cache = M.decode_step_ragged(
                params, self.cfg, tok, cache, write_pos, positions, kv_valid
            )
            logits = (hidden @ w_lm).astype(jnp.float32)
            rng, sub = jax.random.split(rng)
            new_tok, lp = sample_from_logits(sub, logits, self.sampling)
            new_done = done | (new_tok == self.sampling.eos_token_id)
            new_tok = jnp.where(done, self.sampling.pad_token_id, new_tok)
            lp = jnp.where(done, 0.0, lp)
            # advance write position only for live slots (clamped)
            new_write = jnp.where(
                done, write_pos,
                jnp.minimum(write_pos + 1, self.max_seq_len - 1),
            )
            carry = (cache, kv_valid, new_write, new_done, new_tok, rng)
            return carry, (new_tok, lp, done)

        carry = (cache, kv_valid, write_pos, done, cur_tokens, rng)
        carry, (toks, lps, was_done) = jax.lax.scan(
            step, carry, None, length=n_steps
        )
        cache, kv_valid, write_pos, done, cur_tokens, rng = carry
        return cache, kv_valid, write_pos, done, cur_tokens, toks, lps, was_done

    # -- host engine loop ------------------------------------------------
    def generate(
        self, params, request: RolloutRequest, rng: jax.Array
    ) -> RolloutResult:
        n_req = len(request.prompt_ids)
        sp = self.sampling
        pending = list(range(n_req))
        results_tokens: List[List[int]] = [[] for _ in range(n_req)]
        results_lps: List[List[float]] = [[] for _ in range(n_req)]
        slots = [_Slot() for _ in range(self.num_slots)]

        cache = M.init_kv_cache(self.cfg, self.num_slots, self.max_seq_len)
        kv_valid = jnp.zeros((self.num_slots, self.max_seq_len), bool)
        write_pos = jnp.zeros((self.num_slots,), jnp.int32)
        done = jnp.ones((self.num_slots,), bool)  # all free initially
        cur_tokens = jnp.zeros((self.num_slots,), jnp.int32)

        def bucket(n):
            return ((n + self.prompt_bucket - 1) // self.prompt_bucket) * self.prompt_bucket

        active = 0
        while pending or active > 0:
            # 1. refill free slots
            refill_hiddens = []
            for s in range(self.num_slots):
                if not pending:
                    break
                if slots[s].request_idx >= 0 or not bool(done[s]):
                    continue
                req = pending.pop(0)
                ids = request.prompt_ids[req][- (self.max_seq_len - sp.max_new_tokens):]
                P_len = bucket(len(ids))
                prompt = np.zeros((1, P_len), np.int32)
                mask = np.zeros((1, P_len), bool)
                prompt[0, : len(ids)] = ids
                mask[0, : len(ids)] = True
                cache, kv_valid, logits = self._prefill(
                    params, cache, kv_valid, s,
                    jnp.asarray(prompt), jnp.asarray(mask),
                )
                rng, sub = jax.random.split(rng)
                tok, lp = sample_from_logits(sub, logits[None], sp)
                tok_i, lp_i = int(tok[0]), float(lp[0])
                slots[s] = _Slot(request_idx=req, prompt_len=len(ids),
                                 tokens=[tok_i], logprobs=[lp_i])
                write_pos = write_pos.at[s].set(len(ids))
                done = done.at[s].set(
                    tok_i == sp.eos_token_id or sp.max_new_tokens <= 1
                )
                cur_tokens = cur_tokens.at[s].set(tok_i)
                active += 1

            if active == 0:
                break

            # 2. chunked decode
            rng, sub = jax.random.split(rng)
            n_steps = self.decode_chunk
            (cache, kv_valid, write_pos, done, cur_tokens,
             toks, lps, was_done) = self._decode(
                params, cache, kv_valid, write_pos, done, cur_tokens, sub,
                n_steps,
            )
            toks_np = np.asarray(toks)          # [K, slots]
            lps_np = np.asarray(lps)
            was_done_np = np.asarray(was_done)  # done BEFORE each step
            done_np = np.asarray(done)

            # 3. harvest per slot
            for s in range(self.num_slots):
                sl = slots[s]
                if sl.request_idx < 0:
                    continue
                for k in range(n_steps):
                    if was_done_np[k, s]:
                        break
                    if len(sl.tokens) >= sp.max_new_tokens:
                        break
                    sl.tokens.append(int(toks_np[k, s]))
                    sl.logprobs.append(float(lps_np[k, s]))
                finished = (
                    bool(done_np[s])
                    or len(sl.tokens) >= sp.max_new_tokens
                    or sl.prompt_len + len(sl.tokens) >= self.max_seq_len
                )
                if finished:
                    # trim anything after eos
                    tokens, lps_list = sl.tokens, sl.logprobs
                    if sp.eos_token_id in tokens:
                        cut = tokens.index(sp.eos_token_id) + 1
                        tokens, lps_list = tokens[:cut], lps_list[:cut]
                    results_tokens[sl.request_idx] = tokens[: sp.max_new_tokens]
                    results_lps[sl.request_idx] = lps_list[: sp.max_new_tokens]
                    slots[s] = _Slot()
                    done = done.at[s].set(True)
                    kv_valid = kv_valid.at[s].set(
                        jnp.zeros((self.max_seq_len,), bool)
                    )
                    write_pos = write_pos.at[s].set(0)
                    active -= 1

        return self._pack_results(request, results_tokens, results_lps)

    def _pack_results(self, request, results_tokens, results_lps) -> RolloutResult:
        n = len(request.prompt_ids)
        sp = self.sampling
        P = max(len(p) for p in request.prompt_ids)
        P = ((P + self.prompt_bucket - 1) // self.prompt_bucket) * self.prompt_bucket
        N = sp.max_new_tokens
        prompt_ids = np.full((n, P), sp.pad_token_id, np.int32)
        prompt_mask = np.zeros((n, P), bool)
        response_ids = np.full((n, N), sp.pad_token_id, np.int32)
        response_mask = np.zeros((n, N), bool)
        response_lps = np.zeros((n, N), np.float32)
        for i, p in enumerate(request.prompt_ids):
            prompt_ids[i, P - len(p):] = p  # left-padded (train-layout ready)
            prompt_mask[i, P - len(p):] = True
            toks = results_tokens[i]
            response_ids[i, : len(toks)] = toks
            response_mask[i, : len(toks)] = True
            response_lps[i, : len(toks)] = results_lps[i]
        return RolloutResult(
            prompt_ids=prompt_ids,
            prompt_mask=prompt_mask,
            response_ids=response_ids,
            response_mask=response_mask,
            response_logprobs=response_lps,
            answers=request.answers,
        )
