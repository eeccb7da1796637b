"""Decode-phase attribution on the real chip (VERDICT r3: decode at 0.69x
of its HBM roofline — find the gap)."""

import gc
import json
import time

import numpy as np


def sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params, quantize_params,
    )
    from rlinf_tpu.models.llm import model as M
    from rlinf_tpu.utils import flops as F

    cfg = LLMConfig.qwen2_0_5b()
    chip = F.ChipSpec.v5e()
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    params = init_params(cfg, rng)
    qparams = quantize_params(params)

    B, P, N = 64, 256, 128
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), bool)

    sol_prefill = F.prefill_flops(cfg, B, P) / chip.bf16_flops
    sol_dec = sum(F.decode_sol_time(cfg, chip, B, P + t) for t in range(N))
    emit(phase="decode_sol", prefill_s=round(sol_prefill, 4),
         decode_s=round(sol_dec, 4), n_new=N,
         sol_ms_per_step=round(sol_dec / N * 1e3, 3))

    def timeit(fn, args, iters=2):
        out = fn(*args)
        sync(out)
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    pf = jax.jit(lambda p, i, m: M.prefill(p, cfg, i, m, P + N)[0])
    t = timeit(pf, (params, ids, mask))
    emit(phase="prefill_only", time_s=round(t, 4),
         vs_sol=round(sol_prefill / t, 3))

    def run_variant(name, sp, use_q, attn):
        # decode_params passed as a jit ARGUMENT — closure capture would
        # bake 0.5GB of int8 weights into the HLO as constants and wedge
        # the compile server for tens of minutes (round-4 lesson).
        gen = jax.jit(lambda p, qp, rg, i, m: generate(
            p, cfg, rg, i, m, sp, decode_params=qp,
            decode_attn_impl=attn).response_ids)
        qp = qparams if use_q else None
        try:
            t = timeit(lambda *a: gen(params, qp, *a), (rng, ids, mask))
            emit(phase="generate", variant=name, time_s=round(t, 4),
                 ms_per_step=round((t) / N * 1e3, 3),
                 vs_sol=round((sol_prefill + sol_dec) / t, 4))
        except Exception as e:  # noqa: BLE001
            emit(phase="generate", variant=name, error=str(e)[:300])
        gc.collect()

    sp = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1)
    spg = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1,
                         greedy=True)
    run_variant("int8_pallas", sp, True, "pallas")
    run_variant("int8_pallas_greedy", spg, True, "pallas")
    run_variant("bf16_pallas", sp, False, "pallas")
    run_variant("int8_xla", sp, True, None)
    emit(phase="done")


if __name__ == "__main__":
    main()
