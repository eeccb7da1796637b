"""Continuous-batching generation engine: slot refill + chunked decode.

TPU-native re-design of SGLang-style continuous batching (reference
rlinf/hybrid_engines/sglang — paged-KV serving with per-request scheduling;
rollout worker loop at rollout/sglang/sglang_worker.py:409). On TPU, dynamic
shapes are the enemy, so the engine keeps a FIXED pool of B slots:

  * each slot owns a PACKED cache row ([B, S_max, Kv*Hd] per layer — the
    serving layout of models/llm/model.decode_step_packed, up to 16x less
    HBM traffic than the tile-padded [B, S, K, D] layout);
  * finished slots are refilled from the pending-prompt queue via a BATCHED
    jitted prefill (refill rounds are decomposed into power-of-two groups so
    each (R, P) shape compiles once);
  * decode runs K steps per host round inside one jitted ``lax.scan``
    (amortizing dispatch) with per-slot ragged write positions, optionally
    on int8 weight-only decode params (models/llm/quant.py — decode is
    weight-bandwidth-bound, int8 halves it; measured 2.6 vs 4.3 ms/step on
    v5e for the 0.5B at B=64);
  * sequences exceeding their budget or hitting EOS free their slot.

Throughput win over the static batch engine: long-tail decode no longer
holds the whole batch hostage — freed slots immediately serve new prompts.

The slot pool + refill/decode/harvest core is shared by ``generate()``
(batch rollout for RL) and rollout/server.GenerationServer (online serving,
the reference's sglang_server analog).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

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
    budget: int = 0               # max new tokens for this request
    tokens: List[int] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class _Pool:
    """Device + host state for the slot pool."""

    kv_layers: tuple                 # per-layer (k, v), each [B, S_max, KD]
    lengths: jax.Array               # [B] int32 valid cache interval end
    done: jax.Array                  # [B] bool
    cur_tokens: jax.Array            # [B] int32 next input token per slot
    slots: List[_Slot]

    @property
    def num_active(self) -> int:
        return sum(1 for s in self.slots if s.request_idx >= 0)

    @property
    def size(self) -> int:
        return len(self.slots)


@dataclasses.dataclass
class _Finished:
    request_idx: int
    tokens: List[int]
    logprobs: List[float]


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
        weight_quant: str = "none",
        kv_quant: str = "none",
        decode_attn_impl: Optional[str] = None,
        attn_impl: str = "xla",
        compact: bool = True,
        use_mega=False,
        sampler_impl: Optional[str] = None,
        mega_chunk_width: Optional[int] = None,
        mega_threshold: int = 128,
    ):
        """``kv_quant='int8'``: the packed KV cache is stored int8 with one
        f32 scale per (slot, token) — cache HBM traffic halves (decode is
        cache-bandwidth-bound at large slot counts; the fp8-KV serving trick,
        quantize-on-write, scales folded into the attention kernel's
        score/prob rows). Behavior logprobs come from the quantized policy;
        the runner's recompute-logprobs invariant keeps training unbiased."""
        self.cfg = cfg
        self.sampling = sampling
        self.num_slots = num_slots
        self.max_seq_len = max_seq_len or cfg.max_seq_len
        self.prompt_bucket = prompt_bucket
        self.decode_chunk = decode_chunk
        self.weight_quant = weight_quant
        self.kv_quant = kv_quant
        self.decode_attn_impl = decode_attn_impl
        self.attn_impl = attn_impl
        #: shrink the slot pool to a power-of-two over the live set once the
        #: pending queue drains (long-tail decode compaction)
        self.compact = compact
        #: run decode steps as ONE pallas call over all layers
        #: (ops/pallas/decode_megakernel.py) with per-row ragged write
        #: positions — removes the per-layer launch/serialization floor that
        #: dominates small-pool tail steps in long-tail serving mixes.
        #: True = always; "auto" = HYBRID: per-layer kernels while the pool
        #: is large (their gridded attention streams the big cache better),
        #: megakernel once compaction shrinks the pool to <= mega_threshold
        #: (measured v5e crossover on the 0.5B: mega +19%/+7% at 64/128
        #: slots, -41% at 256). The cache relayout happens inside the
        #: compaction gather — one copy of the already-compacted cache.
        self.use_mega = use_mega
        #: None = engine default (XLA lm-head + sample); "fused" = the
        #: Pallas lm-head+gumbel sampler (never materializes [B, V] logits)
        self.sampler_impl = sampler_impl
        #: "auto" hybrid switch point: pools of this size or smaller decode
        #: through the megakernel
        self.mega_threshold = mega_threshold
        if use_mega:
            if weight_quant != "int8" or kv_quant != "int8":
                raise ValueError(
                    "use_mega needs weight_quant='int8' and kv_quant='int8'")
            if num_slots % 8:
                raise ValueError("use_mega needs num_slots % 8 == 0")
            if self.max_seq_len % 128:
                raise ValueError("use_mega needs max_seq_len % 128 == 0 "
                                 "(cache length is a lane dim of the kernel's"
                                 " scale stream)")
            from rlinf_tpu.ops.pallas.decode_megakernel import make_plan

            cw = mega_chunk_width or max(2048, cfg.hidden_size)
            self._plan = make_plan(cfg, cw)
            self._mega_cw = cw
        self._mega_mw = None

        self._refill = jax.jit(self._refill_impl, donate_argnums=(1,))
        self._decode = jax.jit(
            self._decode_impl, donate_argnums=(2,), static_argnums=(7,)
        )
        if weight_quant == "int8":
            from rlinf_tpu.models.llm.quant import quantize_params

            self._quantize = jax.jit(quantize_params)
        else:
            self._quantize = None

    # -- jitted internals ------------------------------------------------
    def _refill_impl(
        self, params, kv_layers, lengths, done, cur_tokens,
        slot_ids, prompt_ids, prompt_mask, rng,
    ):
        """Prefill R prompts (right-padded [R, P], occupying cache [0, plen))
        into rows ``slot_ids`` of the packed cache; sample each row's first
        token. Junk KV in [plen, P) never enters a valid interval — decode
        overwrites position ``lengths`` before extending the interval."""
        R, P = prompt_ids.shape
        hidden, kv = M.forward_hidden(
            params, self.cfg, prompt_ids, attention_mask=prompt_mask,
            return_kv=True, attn_impl=self.attn_impl,
        )
        kd = self.cfg.kv_dim
        new_layers = []
        if self.use_mega and self._is_stacked(kv_layers):
            # stacked [L, B, S, KD] int8 cache (+ [L, B, S] f32 scales)
            from rlinf_tpu.models.llm.model import quantize_packed_kv

            kc, vc, ksc, vsc = kv_layers
            kqs, vqs, kss, vss = [], [], [], []
            for i in range(self.cfg.num_layers):
                kq, ks = quantize_packed_kv(kv.k[i].reshape(R, P, kd))
                vq, vs = quantize_packed_kv(kv.v[i].reshape(R, P, kd))
                kqs.append(kq)
                vqs.append(vq)
                kss.append(ks)
                vss.append(vs)
            kc = kc.at[:, slot_ids, :P].set(jnp.stack(kqs))
            vc = vc.at[:, slot_ids, :P].set(jnp.stack(vqs))
            ksc = ksc.at[:, slot_ids, :P].set(jnp.stack(kss))
            vsc = vsc.at[:, slot_ids, :P].set(jnp.stack(vss))
            new_layers = (kc, vc, ksc, vsc)
        elif self.kv_quant == "int8":
            from rlinf_tpu.models.llm.model import quantize_packed_kv

            for i, (kc, vc, ksc, vsc) in enumerate(kv_layers):
                kq, ks = quantize_packed_kv(kv.k[i].reshape(R, P, kd))
                vq, vs = quantize_packed_kv(kv.v[i].reshape(R, P, kd))
                kc = kc.at[slot_ids, :P].set(kq)
                vc = vc.at[slot_ids, :P].set(vq)
                ksc = ksc.at[slot_ids, :P].set(ks)
                vsc = vsc.at[slot_ids, :P].set(vs)
                new_layers.append((kc, vc, ksc, vsc))
        else:
            for i, (kc, vc) in enumerate(kv_layers):
                kc = kc.at[slot_ids, :P].set(
                    kv.k[i].reshape(R, P, kd).astype(kc.dtype)
                )
                vc = vc.at[slot_ids, :P].set(
                    kv.v[i].reshape(R, P, kd).astype(vc.dtype)
                )
                new_layers.append((kc, vc))

        plens = jnp.sum(prompt_mask.astype(jnp.int32), axis=-1)     # [R]
        last = jnp.maximum(plens - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last[:, None, None], axis=1
        )[:, 0]                                                     # [R, D]
        logits = M.lm_head_logits(params, self.cfg, last_hidden)
        tok, lp = sample_from_logits(rng, logits, self.sampling)

        lengths = lengths.at[slot_ids].set(plens)
        done = done.at[slot_ids].set(tok == self.sampling.eos_token_id)
        cur_tokens = cur_tokens.at[slot_ids].set(tok)
        return tuple(new_layers), lengths, done, cur_tokens, tok, lp

    def _decode_impl(
        self, dparams, mega_mw, kv_layers, lengths, done, cur_tokens, rng,
        n_steps,
    ):
        """K decode steps for all slots on the packed cache. Free slots
        (done=True) decode junk that the host never harvests."""
        B = lengths.shape[0]          # pool may be compacted below num_slots
        S = self.max_seq_len
        starts = jnp.zeros((B,), jnp.int32)
        mega_now = self.use_mega and self._is_stacked(kv_layers)
        if mega_now:
            from rlinf_tpu.ops.rope import rope_frequencies

            cos_tab, sin_tab = rope_frequencies(
                self.cfg.head_dim_, self.cfg.max_seq_len, self.cfg.rope_theta
            )
        use_fused = self.sampler_impl == "fused"
        if use_fused:
            from rlinf_tpu.models.llm.sampler import _sample_hidden

        def _sample(sub, hidden):
            if use_fused:
                return _sample_hidden(
                    dparams, self.cfg, sub, hidden, self.sampling, True)
            logits = M.lm_head_logits(dparams, self.cfg, hidden)
            return sample_from_logits(sub, logits, self.sampling)

        def step(carry, _):
            kv_layers, lengths, done, tok, rng = carry
            write_pos = jnp.minimum(lengths, S - 1)
            if mega_now:
                from rlinf_tpu.ops.norm import rms_norm
                from rlinf_tpu.ops.pallas.decode_megakernel import (
                    decode_step_mega,
                )

                kc, vc, ks, vs = kv_layers
                x0 = dparams["embed"][tok].astype(self.cfg.compute_dtype)
                hidden, kc, vc, ks, vs = decode_step_mega(
                    self._plan, mega_mw, x0, kc, vc, ks, vs, write_pos,
                    write_pos, starts, cos_tab, sin_tab,
                )
                hidden = rms_norm(
                    hidden, dparams["final_norm"], self.cfg.rms_eps)
                kv_layers = (kc, vc, ks, vs)
            else:
                step_fn = (
                    M.decode_step_packed_q8 if self.kv_quant == "int8"
                    else M.decode_step_packed
                )
                hidden, kv_layers = step_fn(
                    dparams, self.cfg, tok, kv_layers, write_pos,
                    positions=write_pos, starts=starts, lengths=write_pos + 1,
                    attn_impl=self.decode_attn_impl,
                )
            rng, sub = jax.random.split(rng)
            new_tok, lp = _sample(sub, hidden)
            new_done = done | (new_tok == self.sampling.eos_token_id)
            new_tok = jnp.where(done, self.sampling.pad_token_id, new_tok)
            lp = jnp.where(done, 0.0, lp)
            new_lengths = jnp.where(
                done, lengths, jnp.minimum(lengths + 1, S)
            )
            carry = (kv_layers, new_lengths, new_done, new_tok, rng)
            return carry, (new_tok, lp, done)

        carry = (kv_layers, lengths, done, cur_tokens, rng)
        carry, (toks, lps, was_done) = jax.lax.scan(
            step, carry, None, length=n_steps
        )
        kv_layers, lengths, done, cur_tokens, rng = carry
        return kv_layers, lengths, done, cur_tokens, toks, lps, was_done

    # -- pool core (shared by generate() and GenerationServer) -----------
    @staticmethod
    def _is_stacked(kv_layers) -> bool:
        """Stacked [L, B, S, KD] megakernel layout vs per-layer tuples."""
        return isinstance(kv_layers[0], jax.Array)

    def init_pool(self) -> _Pool:
        mega_now = self.use_mega is True or (
            self.use_mega == "auto"
            and self.num_slots <= self.mega_threshold
        )
        if mega_now:
            L = self.cfg.num_layers
            shape = (L, self.num_slots, self.max_seq_len, self.cfg.kv_dim)
            cache = (
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.ones(shape[:3], jnp.float32),
                jnp.ones(shape[:3], jnp.float32),
            )
        else:
            init_cache = (
                M.init_kv_cache_packed_q8 if self.kv_quant == "int8"
                else M.init_kv_cache_packed
            )
            cache = init_cache(self.cfg, self.num_slots, self.max_seq_len)
        return _Pool(
            kv_layers=cache,
            lengths=jnp.zeros((self.num_slots,), jnp.int32),
            done=jnp.ones((self.num_slots,), bool),     # all free
            cur_tokens=jnp.zeros((self.num_slots,), jnp.int32),
            slots=[_Slot() for _ in range(self.num_slots)],
        )

    def prepare_params(self, params):
        """Returns (prefill_params, decode_params): identical unless int8
        weight-only decode quantization is enabled — re-quantizing fresh
        learner params per rollout is the weight-sync analog of the
        reference's per-step rollout reload (sgl_scheduler.py:141)."""
        if self._quantize is not None:
            dparams = self._quantize(params)
            if self.use_mega:
                # repack the chunk stream for the megakernel; stored on the
                # engine and passed to the decode jit as an ARGUMENT (a
                # closure capture would bake multi-GB constants into the HLO)
                if not hasattr(self, "_pack"):
                    from rlinf_tpu.ops.pallas.decode_megakernel import (
                        pack_decode_weights,
                    )

                    self._pack = jax.jit(lambda qp: pack_decode_weights(
                        qp, self.cfg, self._mega_cw)[1])
                self._mega_mw = self._pack(dparams)
            return params, dparams
        return params, params

    def trim_prompt(self, ids: Sequence[int], budget: int) -> List[int]:
        keep = self.max_seq_len - budget
        return list(ids)[-keep:] if keep > 0 else list(ids)[-1:]

    def refill(
        self,
        pool: _Pool,
        params,
        entries: List[Tuple[int, Sequence[int], int]],
        rng: jax.Array,
    ) -> int:
        """Assign free slots to ``entries`` [(request_idx, prompt_ids,
        budget)]. Refills are grouped into power-of-two batches (longest
        prompts first) so each (R, P) shape is a cached compile. Returns the
        number of entries admitted (all of them, given enough free slots)."""
        free = [s for s in range(pool.size)
                if pool.slots[s].request_idx < 0]
        entries = entries[: len(free)]
        if not entries:
            return 0
        # longest-first keeps same-magnitude prompts in one bucket
        order = sorted(
            range(len(entries)), key=lambda i: -len(entries[i][1])
        )
        queue = [
            (free[k], entries[i][0], self.trim_prompt(
                entries[i][1], entries[i][2]), entries[i][2])
            for k, i in enumerate(order)
        ]
        admitted = len(queue)
        while queue:
            r = 1
            while r * 2 <= len(queue):
                r *= 2
            group, queue = queue[:r], queue[r:]
            P = max(len(ids) for _, _, ids, _ in group)
            P = ((P + self.prompt_bucket - 1) // self.prompt_bucket
                 ) * self.prompt_bucket
            # Short-cache configs: the bucketed prefill width must never
            # exceed the packed cache length (prompts are already trimmed).
            P = min(P, self.max_seq_len)
            prompt = np.zeros((r, P), np.int32)
            mask = np.zeros((r, P), bool)
            slot_ids = np.zeros((r,), np.int32)
            for j, (s, _, ids, _) in enumerate(group):
                prompt[j, : len(ids)] = ids
                mask[j, : len(ids)] = True
                slot_ids[j] = s
            rng, sub = jax.random.split(rng)
            (pool.kv_layers, pool.lengths, pool.done, pool.cur_tokens,
             tok, lp) = self._refill(
                params, pool.kv_layers, pool.lengths, pool.done,
                pool.cur_tokens, jnp.asarray(slot_ids), jnp.asarray(prompt),
                jnp.asarray(mask), sub,
            )
            tok_np = np.asarray(tok)
            lp_np = np.asarray(lp)
            for j, (s, req_idx, ids, budget) in enumerate(group):
                pool.slots[s] = _Slot(
                    request_idx=req_idx, prompt_len=len(ids), budget=budget,
                    tokens=[int(tok_np[j])], logprobs=[float(lp_np[j])],
                )
        return admitted

    def decode_and_harvest(
        self, pool: _Pool, decode_params, rng: jax.Array
    ) -> List[_Finished]:
        """One K-step decode chunk + host-side harvest. Returns finished
        requests; their slots are freed for the next refill round."""
        sp = self.sampling
        K = self.decode_chunk
        (pool.kv_layers, pool.lengths, pool.done, pool.cur_tokens,
         toks, lps, was_done) = self._decode(
            decode_params, self._mega_mw, pool.kv_layers, pool.lengths,
            pool.done, pool.cur_tokens, rng, K,
        )
        # one host sync for the whole chunk; per-slot appends are numpy
        # slices (the python-per-token harvest was the serving bottleneck at
        # large slot counts: O(slots x K) int()/append per chunk)
        toks_np, lps_np, was_done_np, done_np = jax.device_get(
            (toks, lps, was_done, pool.done)
        )
        toks_np = np.asarray(toks_np)       # [K, B]
        lps_np = np.asarray(lps_np)
        was_done_np = np.asarray(was_done_np)  # done BEFORE each step
        done_np = np.asarray(done_np)
        any_done = was_done_np.any(axis=0)               # [B]
        first_done = np.where(
            any_done, np.argmax(was_done_np, axis=0), K
        )                                                # [B]

        finished: List[_Finished] = []
        free_mask = np.zeros((pool.size,), bool)
        for s in range(pool.size):
            sl = pool.slots[s]
            if sl.request_idx < 0:
                continue
            take = min(int(first_done[s]), sl.budget - len(sl.tokens))
            if take > 0:
                sl.tokens.extend(toks_np[:take, s].tolist())
                sl.logprobs.extend(lps_np[:take, s].tolist())
            if (
                bool(done_np[s])
                or len(sl.tokens) >= sl.budget
                or sl.prompt_len + len(sl.tokens) >= self.max_seq_len
            ):
                tokens, lp_list = sl.tokens, sl.logprobs
                if sp.eos_token_id in tokens:
                    cut = tokens.index(sp.eos_token_id) + 1
                    tokens, lp_list = tokens[:cut], lp_list[:cut]
                finished.append(_Finished(
                    sl.request_idx, tokens[: sl.budget], lp_list[: sl.budget]
                ))
                pool.slots[s] = _Slot()
                free_mask[s] = True
        if free_mask.any():
            # freed slots must stop decoding (their lengths would keep
            # growing into garbage): mark done, reset interval
            fm = jnp.asarray(free_mask)
            pool.done = pool.done | fm
            pool.lengths = jnp.where(fm, 0, pool.lengths)
        return finished

    # -- batch rollout loop ----------------------------------------------
    def compact_pool(self, pool: _Pool) -> _Pool:
        """Shrink the pool to the next power-of-two that holds the live
        slots (VERDICT r4 item 6: ragged long-tail decode). A decode step's
        cost is dominated by flat per-step terms (weight stream, lm-head
        matmul + sampling over the whole slot axis), so a tail with 20 live
        slots in a 256-slot pool wastes ~90% of every step. Live cache rows
        are gathered to the front (one [B_new, S, KD] row gather per layer
        array — ~2ms at 256 slots, amortized over the whole tail) and the
        smaller decode shape is its own cached compile."""
        live = [s for s in range(pool.size)
                if pool.slots[s].request_idx >= 0]
        n_live = max(len(live), 1)
        new_size = max(8, 1 << (n_live - 1).bit_length())
        if new_size >= pool.size:
            return pool
        dead = [s for s in range(pool.size)
                if pool.slots[s].request_idx < 0][: new_size - len(live)]
        perm = jnp.asarray(live + dead, jnp.int32)
        if self._is_stacked(pool.kv_layers):
            # stacked [L, B, ...] arrays: gather rows along the slot axis
            kv = tuple(arr[:, perm] for arr in pool.kv_layers)
        elif self.use_mega == "auto" and new_size <= self.mega_threshold:
            # hybrid switch point: relayout the per-layer q8 tuples into the
            # megakernel's stacked arrays inside the compaction gather (one
            # copy of the already-compacted cache, ~a single step's cost)
            kv = tuple(
                jnp.stack([layer[i][perm] for layer in pool.kv_layers])
                for i in range(4)
            )
        else:
            kv = tuple(
                tuple(arr[perm] for arr in layer) for layer in pool.kv_layers
            )
        return _Pool(
            kv_layers=kv,
            lengths=pool.lengths[perm],
            done=pool.done[perm],
            cur_tokens=pool.cur_tokens[perm],
            slots=[pool.slots[int(s)] for s in (live + dead)],
        )

    def generate(
        self, params, request: RolloutRequest, rng: jax.Array
    ) -> RolloutResult:
        n_req = len(request.prompt_ids)
        sp = self.sampling
        pending = list(range(n_req))
        results_tokens: List[List[int]] = [[] for _ in range(n_req)]
        results_lps: List[List[float]] = [[] for _ in range(n_req)]
        pparams, dparams = self.prepare_params(params)
        pool = self.init_pool()

        n_done = 0
        while n_done < n_req:
            if pending:
                entries = [
                    (i, request.prompt_ids[i],
                     request.budget_for(i, sp.max_new_tokens))
                    for i in pending[: pool.size]
                ]
                rng, sub = jax.random.split(rng)
                admitted = self.refill(pool, pparams, entries, sub)
                pending = pending[admitted:]
            if pool.num_active == 0:
                break
            rng, sub = jax.random.split(rng)
            for fin in self.decode_and_harvest(pool, dparams, sub):
                results_tokens[fin.request_idx] = fin.tokens
                results_lps[fin.request_idx] = fin.logprobs
                n_done += 1
            if (
                self.compact
                and not pending
                and pool.num_active
                and pool.num_active * 2 <= pool.size
                and pool.size > 8
            ):
                pool = self.compact_pool(pool)

        return self._pack_results(request, results_tokens, results_lps)

    def rollout(
        self, params, request: RolloutRequest, rng: jax.Array, *, mesh=None
    ) -> RolloutResult:
        """Runner-facing API (matches rollout.engine.RolloutEngine.rollout).
        The slot pool is single-program; a mesh shards the model params, not
        the slots."""
        return self.generate(params, request, rng)

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
