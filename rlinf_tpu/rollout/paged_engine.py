"""Paged continuous-batching engine: page-pool KV + slot refill decode.

The paged upgrade of ``continuous_engine.ContinuousBatchingEngine``
(reference analog: SGLang's paged-KV scheduler, SURVEY.md §2.9): instead of
a dense per-slot cache [L, B, S_max, K, D], KV lives in global page pools
[L, num_pages, Kv, P, Hd] managed by the host-side ``PagePool``. Slot
turnover is O(1) page-table writes; HBM holds only ~sum(lengths) tokens of
KV instead of B*S_max.

Decode attention dispatches to the Pallas paged kernel on TPU
(``attn_impl="pallas"``) or the XLA gather oracle elsewhere. Page pools are
kept as per-layer arrays (tuple) carried through the decode scan so XLA
performs the per-token writes in place (same trick as
models/llm/model.decode_step_layered — avoids rematerializing the pool).

Chunk-ahead allocation: before each K-step decode chunk the host allocates
K token positions for every occupied slot (pages as needed). Slots that
finish mid-chunk are freed wholesale at harvest, so no rollback is needed —
over-allocated pages return to the pool with the slot.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.data.io_struct import RolloutRequest, RolloutResult
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams, sample_from_logits
from rlinf_tpu.ops.norm import rms_norm
from rlinf_tpu.ops.rope import apply_rope, rope_frequencies
from rlinf_tpu.ops.pallas.paged_attention import (
    paged_attention,
    paged_attention_xla,
)
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine, _Slot
from rlinf_tpu.rollout.paged_cache import PagePool


class PagedContinuousEngine(ContinuousBatchingEngine):
    """Same host scheduling loop and results contract as the dense engine;
    only the KV representation and the jitted prefill/decode differ."""

    def __init__(
        self,
        cfg: LLMConfig,
        sampling: SamplingParams,
        *,
        num_slots: int = 32,
        max_seq_len: Optional[int] = None,
        prompt_bucket: int = 64,
        decode_chunk: int = 16,
        page_size: int = 16,
        num_pages: Optional[int] = None,
        attn_impl: str = "xla",
    ):
        assert prompt_bucket % page_size == 0
        super().__init__(
            cfg, sampling, num_slots=num_slots, max_seq_len=max_seq_len,
            prompt_bucket=prompt_bucket, decode_chunk=decode_chunk,
        )
        self.page_size = page_size
        self.max_pages_per_slot = -(-self.max_seq_len // page_size)
        self.num_pages = num_pages or (
            1 + num_slots * self.max_pages_per_slot
        )
        self.attn_impl = attn_impl
        self._prefill_paged = jax.jit(
            self._prefill_paged_impl, donate_argnums=(1, 2)
        )
        self._decode_paged = jax.jit(
            self._decode_paged_impl, donate_argnums=(1, 2), static_argnums=(11,)
        )

    # -- state -------------------------------------------------------------
    def _init_pools(self):
        c = self.cfg
        shape = (self.num_pages, c.num_kv_heads, self.page_size, c.head_dim_)
        k_layers = tuple(
            jnp.zeros(shape, c.compute_dtype) for _ in range(c.num_layers)
        )
        v_layers = tuple(
            jnp.zeros(shape, c.compute_dtype) for _ in range(c.num_layers)
        )
        return k_layers, v_layers

    # -- jitted internals ----------------------------------------------------
    def _prefill_paged_impl(self, params, k_layers, v_layers, prompt_ids,
                            prompt_mask, page_ids):
        """BATCHED prefill [R, Pb] (Pb multiple of page_size), scattering
        each row's KV into its ``page_ids`` row ([R, Pb/page_size]) of every
        layer's pool. Grouped power-of-two R keeps the compile count bounded
        (same strategy as the dense engine's refill)."""
        hidden, kv = M.forward_hidden(
            params, self.cfg, prompt_ids, attention_mask=prompt_mask,
            return_kv=True,
        )
        R, Pb = prompt_ids.shape
        n_pages = Pb // self.page_size
        Kv, Hd = self.cfg.num_kv_heads, self.cfg.head_dim_
        new_k, new_v = [], []
        for i in range(self.cfg.num_layers):
            # kv.k[i]: [R, Pb, Kv, Hd] -> [R, n_pages, Kv, P, Hd]
            kk = kv.k[i].reshape(R, n_pages, self.page_size, Kv, Hd)
            vv = kv.v[i].reshape(R, n_pages, self.page_size, Kv, Hd)
            new_k.append(k_layers[i].at[page_ids].set(kk.swapaxes(2, 3)))
            new_v.append(v_layers[i].at[page_ids].set(vv.swapaxes(2, 3)))
        last = jnp.sum(prompt_mask.astype(jnp.int32), axis=1) - 1   # [R]
        last_h = jnp.take_along_axis(
            hidden, last[:, None, None], axis=1
        )[:, 0]
        w_lm = M.lm_head_weight(params, self.cfg)
        logits = (last_h @ w_lm).astype(jnp.float32)                # [R, V]
        return tuple(new_k), tuple(new_v), logits

    def _attend(self, q, k_pool, v_pool, page_table, lengths):
        if self.attn_impl == "pallas":
            return paged_attention(q, k_pool, v_pool, page_table, lengths)
        return paged_attention_xla(q, k_pool, v_pool, page_table, lengths)

    def _decode_paged_impl(
        self, params, k_layers, v_layers, page_table, base_len,
        write_pages, write_offsets, done, cur_tokens, rng, pad_mask, n_steps,
    ):
        """K decode steps over the page pools.

        page_table [B, max_pages] (post chunk-ahead allocation),
        base_len [B] real tokens before this chunk,
        write_pages/write_offsets [K, B] per-step write positions,
        pad_mask [B] True for UNOCCUPIED slots (excluded from length math).
        """
        c = self.cfg
        B = cur_tokens.shape[0]
        cos, sin = rope_frequencies(c.head_dim_, c.max_seq_len, c.rope_theta)
        w_lm = M.lm_head_weight(params, c)

        def step(carry, inputs):
            k_layers, v_layers, tok, done, rng = carry
            pages_k, offs_k, k_idx = inputs
            pos = base_len + k_idx          # [B] rope position of this token
            lengths = jnp.where(pad_mask, 0, pos + 1)
            x = params["embed"][tok][:, None, :].astype(c.compute_dtype)
            new_k_layers, new_v_layers = [], []
            for i in range(c.num_layers):
                layer = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
                h = rms_norm(x, layer["attn_norm"], c.rms_eps)
                q, kk, vv = M._project_qkv(c, layer, h, B, 1)
                q, kk = apply_rope(q, kk, cos, sin, pos[:, None])
                k_pool = k_layers[i].at[pages_k, :, offs_k, :].set(kk[:, 0])
                v_pool = v_layers[i].at[pages_k, :, offs_k, :].set(vv[:, 0])
                attn = self._attend(
                    q[:, 0], k_pool, v_pool, page_table, lengths
                )
                x = x + attn.reshape(B, 1, c.q_dim) @ layer["wo"]
                x, _ = M._mlp_or_moe(c, x, layer)
                new_k_layers.append(k_pool)
                new_v_layers.append(v_pool)
            x = rms_norm(x, params["final_norm"], c.rms_eps)
            logits = (x[:, 0] @ w_lm).astype(jnp.float32)
            rng, sub = jax.random.split(rng)
            new_tok, lp = sample_from_logits(sub, logits, self.sampling)
            new_done = done | (new_tok == self.sampling.eos_token_id)
            new_tok = jnp.where(done, self.sampling.pad_token_id, new_tok)
            lp = jnp.where(done, 0.0, lp)
            carry = (tuple(new_k_layers), tuple(new_v_layers), new_tok,
                     new_done, rng)
            return carry, (new_tok, lp, done)

        carry = (k_layers, v_layers, cur_tokens, done, rng)
        carry, (toks, lps, was_done) = jax.lax.scan(
            step, carry,
            (write_pages, write_offsets, jnp.arange(n_steps)),
        )
        k_layers, v_layers, cur_tokens, done, rng = carry
        return k_layers, v_layers, done, cur_tokens, toks, lps, was_done

    # -- host engine loop ----------------------------------------------------
    def generate(self, params, request: RolloutRequest, rng: jax.Array
                 ) -> RolloutResult:
        n_req = len(request.prompt_ids)
        sp = self.sampling
        pending = list(range(n_req))
        results_tokens: List[List[int]] = [[] for _ in range(n_req)]
        results_lps: List[List[float]] = [[] for _ in range(n_req)]
        slots = [_Slot() for _ in range(self.num_slots)]
        pool = PagePool(self.num_pages, self.page_size, self.num_slots,
                        self.max_pages_per_slot)
        k_layers, v_layers = self._init_pools()
        done_np = np.ones((self.num_slots,), bool)
        cur_tok_np = np.zeros((self.num_slots,), np.int32)

        def bucket(n):
            b = self.prompt_bucket
            return ((n + b - 1) // b) * b

        active = 0
        while pending or active > 0:
            # 1. refill free slots: admit prompts (page backpressure), then
            # prefill in BATCHED groups by bucketed length (power-of-two
            # group sizes bound the compile count, like the dense engine)
            admitted = []        # (slot, req, ids, Pb)
            free_slots = [s for s in range(self.num_slots)
                          if slots[s].request_idx < 0]
            for s in free_slots:
                if not pending:
                    break
                req = pending[0]
                budget = request.budget_for(req, sp.max_new_tokens)
                ids = request.prompt_ids[req][
                    -(self.max_seq_len - budget):]
                Pb = bucket(len(ids))
                if not pool.can_alloc(Pb):
                    break  # backpressure: wait for slots to free pages
                pending.pop(0)
                pool.alloc_slot(s, Pb)          # claim the padded region
                pool.lengths[s] = len(ids)      # but only real tokens count
                admitted.append((s, req, ids, Pb, budget))

            by_pb = {}
            for entry in admitted:
                by_pb.setdefault(entry[3], []).append(entry)
            for Pb, entries in by_pb.items():
                while entries:
                    r = 1
                    while r * 2 <= len(entries):
                        r *= 2
                    group, entries = entries[:r], entries[r:]
                    n_pg = Pb // self.page_size
                    prompt = np.zeros((r, Pb), np.int32)
                    mask = np.zeros((r, Pb), bool)
                    page_ids = np.zeros((r, n_pg), np.int32)
                    for j, (s, req, ids, _, _) in enumerate(group):
                        prompt[j, : len(ids)] = ids
                        mask[j, : len(ids)] = True
                        page_ids[j] = pool.page_table[s, :n_pg]
                    k_layers, v_layers, logits = self._prefill_paged(
                        params, k_layers, v_layers,
                        jnp.asarray(prompt), jnp.asarray(mask),
                        jnp.asarray(page_ids),
                    )
                    rng, sub = jax.random.split(rng)
                    tok, lp = sample_from_logits(sub, logits, sp)
                    tok_np = np.asarray(tok)
                    lp_np = np.asarray(lp)
                    for j, (s, req, ids, _, budget) in enumerate(group):
                        tok_i, lp_i = int(tok_np[j]), float(lp_np[j])
                        slots[s] = _Slot(
                            request_idx=req, prompt_len=len(ids),
                            budget=budget,
                            tokens=[tok_i], logprobs=[lp_i],
                        )
                        done_np[s] = (
                            tok_i == sp.eos_token_id or budget <= 1
                        )
                        cur_tok_np[s] = tok_i
                        active += 1

            if active == 0:
                break

            # 2. chunk-ahead page allocation for K steps
            K = self.decode_chunk
            base_len = pool.lengths.copy()
            pad_mask = np.array([sl.request_idx < 0 for sl in slots])
            write_pages, write_offsets = pool.append_tokens_chunk(
                ~pad_mask, K
            )
            page_table_snapshot = pool.page_table.copy()

            # 3. jitted K-step decode
            rng, sub = jax.random.split(rng)
            (k_layers, v_layers, done_j, cur_j, toks, lps, was_done
             ) = self._decode_paged(
                params, k_layers, v_layers,
                jnp.asarray(page_table_snapshot), jnp.asarray(base_len),
                jnp.asarray(write_pages), jnp.asarray(write_offsets),
                jnp.asarray(done_np), jnp.asarray(cur_tok_np), sub,
                jnp.asarray(pad_mask), K,
            )
            toks_np, lps_np, was_done_np, done_np, cur_tok_np = (
                jax.device_get((toks, lps, was_done, done_j, cur_j))
            )
            toks_np = np.asarray(toks_np)
            lps_np = np.asarray(lps_np)
            was_done_np = np.asarray(was_done_np)
            done_np = np.asarray(done_np).copy()
            cur_tok_np = np.asarray(cur_tok_np).copy()
            any_done = was_done_np.any(axis=0)
            first_done = np.where(
                any_done, np.argmax(was_done_np, axis=0), K
            )

            # 4. harvest (vectorized like the dense engine)
            for s in range(self.num_slots):
                sl = slots[s]
                if sl.request_idx < 0:
                    continue
                take = min(int(first_done[s]), sl.budget - len(sl.tokens))
                if take > 0:
                    sl.tokens.extend(toks_np[:take, s].tolist())
                    sl.logprobs.extend(lps_np[:take, s].tolist())
                finished = (
                    bool(done_np[s])
                    or len(sl.tokens) >= sl.budget
                    or sl.prompt_len + len(sl.tokens) >= self.max_seq_len
                )
                if finished:
                    tokens, lps_list = sl.tokens, sl.logprobs
                    if sp.eos_token_id in tokens:
                        cut = tokens.index(sp.eos_token_id) + 1
                        tokens, lps_list = tokens[:cut], lps_list[:cut]
                    results_tokens[sl.request_idx] = tokens[: sl.budget]
                    results_lps[sl.request_idx] = lps_list[: sl.budget]
                    slots[s] = _Slot()
                    pool.free_slot(s)
                    done_np[s] = True

                    active -= 1

        return self._pack_results(request, results_tokens, results_lps)
