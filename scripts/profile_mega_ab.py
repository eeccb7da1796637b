"""Megakernel A/B on the real chip: whole-step pallas decode vs per-layer.

Measures full generate() (B=64, P=256, N=256) for the flagship 1.5B and the
0.5B under: (a) per-layer q8 pallas path (round-4 bench config, now with the
fused sampler), (b) decode megakernel. Emits jsonl lines progressively so a
background run can be polled.

Usage: python scripts/profile_mega_ab.py [qwen2_1_5b qwen2_0_5b ...]
"""

import json
import os
import sys
import time

import numpy as np

# repo root on sys.path WITHOUT PYTHONPATH (a PYTHONPATH entry breaks the
# axon jax-plugin discovery on this image)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0].astype(jnp.float32)))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run_model(preset: str, chunk_widths=(2048,)):
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params, quantize_params,
    )
    from rlinf_tpu.ops.pallas.decode_megakernel import pack_decode_weights
    from rlinf_tpu.utils import flops as F
    from rlinf_tpu.utils.chips import detect_chip

    cfg = getattr(LLMConfig, preset)()
    c = detect_chip(default="v5e")
    chip = F.ChipSpec(name=c.name, bf16_flops=c.bf16_flops, hbm_bw=c.hbm_bw,
                      hbm_bytes=c.hbm_bytes)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    params = init_params(cfg, rng)
    qparams = quantize_params(params)
    B, P, N = 64, 256, 256
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), bool)
    sp = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1)

    sol_prefill = F.prefill_flops(cfg, B, P) / chip.bf16_flops
    sol_decode = sum(F.decode_sol_time(cfg, chip, B, P + t) for t in range(N))
    emit(phase="sol", model=preset, sol_prefill=round(sol_prefill, 4),
         sol_decode=round(sol_decode, 4))

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out.response_ids)
        for w in range(2):
            out = fn(*args)
        sync(out.response_ids)
        t0 = time.perf_counter()
        iters = 3
        for i in range(iters):
            out = fn(*args)
        sync(out.response_ids)
        t = (time.perf_counter() - t0) / iters
        emit(phase="generate", model=preset, variant=name,
             time_s=round(t, 4),
             vs_sol=round((sol_prefill + sol_decode) / t, 4))
        return t

    base = jax.jit(lambda p, qp, rg, i, m: generate(
        p, cfg, rg, i, m, sp, decode_params=qp,
        decode_attn_impl="pallas", kv_quant="int8"))
    timeit("perlayer_q8", base, params, qparams, rng, ids, mask)

    for cw in chunk_widths:
        plan, mw = pack_decode_weights(qparams, cfg, chunk_width=cw)
        megaf = jax.jit(lambda p, qp, mwa, rg, i, m, plan=plan: generate(
            p, cfg, rg, i, m, sp, decode_params=qp,
            decode_attn_impl="pallas", kv_quant="int8", mega=(plan, mwa)))
        timeit(f"mega_cw{cw}", megaf, params, qparams, mw, rng, ids, mask)


def main():
    import jax

    assert jax.default_backend() == "tpu", "run on the TPU host"
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "tpu"))
    from test_onchip_parity import run_all

    gate = run_all(checks={"megakernel_generate"})
    emit(phase="parity", **{k: v for k, v in gate.items()})
    if not all(v["ok"] for v in gate.values()):
        emit(phase="abort", reason="parity failed")
        return

    presets = sys.argv[1:] or ["qwen2_1_5b", "qwen2_0_5b"]
    for p in presets:
        run_model(p)
    emit(phase="done")


if __name__ == "__main__":
    main()
