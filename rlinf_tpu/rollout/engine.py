"""RolloutEngine: jitted batched generation with prompt-length bucketing.

TPU-native replacement for the reference's rollout workers + embedded serving
engines (reference rlinf/workers/rollout/sglang/sglang_worker.py:409 rollout
loop, hybrid_engines/sglang/common/sgl_scheduler.py:52). Weight "sync" is the
params pytree argument itself — the collocated-mode analog of the CUDA-IPC
handle transfer (reference megatron_actor_worker.py:362): zero copies, the
learner's sharded params feed generation directly.

Prompt lengths are bucketed to bound recompilation: each (P_bucket) shape
compiles once, then is cached by jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import numpy as np

from rlinf_tpu.data.io_struct import RolloutRequest, RolloutResult
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams, generate


class RolloutEngine:
    def __init__(
        self,
        cfg: LLMConfig,
        sampling: SamplingParams,
        *,
        prompt_bucket: int = 64,
        attn_impl: str = "xla",
        decode_attn_impl: Optional[str] = None,
        weight_quant: str = "none",
    ):
        """weight_quant="int8": decode runs on int8 weight-only quantized
        params (quantization happens INSIDE the jitted program, so fresh
        learner params are re-quantized on every rollout at ~zero cost —
        the weight-sync analog of the reference's per-step rollout reload,
        sgl_scheduler.py:141). Prefill and reported logprobs semantics are
        unchanged; see models/llm/quant.py for the RL-correctness argument.
        """
        self.cfg = cfg
        self.sampling = sampling
        self.prompt_bucket = prompt_bucket
        self.attn_impl = attn_impl
        self.weight_quant = weight_quant

        def _gen(params, rng, prompt_ids, prompt_mask):
            dparams = None
            if weight_quant == "int8":
                from rlinf_tpu.models.llm.quant import quantize_params

                dparams = quantize_params(params)
            return generate(
                params, cfg, rng, prompt_ids, prompt_mask, sampling,
                attn_impl=attn_impl, decode_params=dparams,
                decode_attn_impl=decode_attn_impl,
            )

        self._generate = jax.jit(_gen)

    def rollout(
        self,
        params: M.Params,
        request: RolloutRequest,
        rng: jax.Array,
        *,
        mesh=None,
    ) -> RolloutResult:
        """Generate responses for a request batch. With a mesh, prompts are
        sharded over the data axes (DP rollout; the reference's per-engine DP
        instance split, sglang_worker.py:409)."""
        prompt_ids, prompt_mask = request.left_padded(
            self.sampling.pad_token_id, bucket=self.prompt_bucket
        )
        ids = jax.numpy.asarray(prompt_ids)
        mask = jax.numpy.asarray(prompt_mask)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from rlinf_tpu.parallel.distributed import global_device_put
            from rlinf_tpu.parallel.mesh import AxisNames as Ax

            spec = P(Ax.BATCH, None)
            ids = global_device_put(ids, mesh, spec)
            mask = global_device_put(mask, mesh, spec)
        out = self._generate(
            params,
            rng=rng,
            prompt_ids=ids,
            prompt_mask=mask,
        )
        from rlinf_tpu.parallel.distributed import fetch_global

        return RolloutResult(
            prompt_ids=prompt_ids,
            prompt_mask=prompt_mask,
            response_ids=fetch_global(out.response_ids),
            response_mask=fetch_global(out.response_mask),
            response_logprobs=fetch_global(out.response_logprobs),
            answers=request.answers,
        )
