"""1.5B decode/prefill attribution on the real chip (megakernel sizing).

Splits the bench's gen phase: prefill time, per-decode-step time, and the
per-phase roofline components, on the production int8-weight + int8-KV
packed-pallas path.
"""

import json
import time

import numpy as np


def sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0].astype(jnp.float32)))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params, quantize_params,
    )
    from rlinf_tpu.utils import flops as F

    cfg = LLMConfig.qwen2_1_5b()
    chip = F.ChipSpec.v5e()
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    params = init_params(cfg, rng)
    qparams = quantize_params(params)
    B, P = 64, 256

    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), bool)

    for N in (8, 64, 256):
        sp = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1)
        gen = jax.jit(
            lambda p, qp, rg, i, m, sp=sp: generate(
                p, cfg, rg, i, m, sp, decode_params=qp,
                decode_attn_impl="pallas", kv_quant="int8",
            )
        )
        out = gen(params, qparams, rng, ids, mask)
        sync(out.response_ids)
        for w in range(2):
            out = gen(params, qparams, jax.random.fold_in(rng, w), ids, mask)
        sync(out.response_ids)
        t0 = time.perf_counter()
        iters = 3
        for i in range(iters):
            out = gen(params, qparams, jax.random.fold_in(rng, 10 + i), ids, mask)
        sync(out.response_ids)
        t = (time.perf_counter() - t0) / iters
        emit(phase="generate", N=N, time_s=round(t, 4))

    # linear fit: time(N) = prefill + N * step  (use N=64 vs 256)
    emit(phase="done")


if __name__ == "__main__":
    main()
