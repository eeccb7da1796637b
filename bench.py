"""End-to-end RL step benchmark on the flagship LLM (single chip).

Measures the two hot phases of a GRPO step (SURVEY.md §3.1 steps 3 and 6) on
real hardware and prints ONE JSON line:

  {"metric": "rl_e2e_tokens_per_s", "value": ..., "unit": "tok/s/chip",
   "vs_baseline": ...}

value        = (generated tokens + trained tokens) / (decode + train seconds)
vs_baseline  = measured / speed-of-light for the same workload on this chip
               (roofline: MXU-bound training + HBM-bound decode,
               rlinf_tpu/utils/flops.py). 1.0 == hardware limit; the
               reference's GPU stack lands well below its own roofline on
               A100/H100, so sustained >0.4 here beats it at equal hardware.

Keep this file runnable in < ~10 min including compiles.
"""

import json
import os
import sys
import time

import numpy as np


def _sync(x):
    """Force execution + device->host sync.

    On the axon-tunneled TPU backend, ``jax.block_until_ready`` returns
    immediately (execution is deferred until a host fetch), so timing must
    bracket an actual scalar fetch. The ~30ms tunnel round-trip is amortized
    by iterating enough work between syncs.
    """
    import jax.numpy as jnp
    import numpy as np

    leaf = None
    import jax

    for l in jax.tree_util.tree_leaves(x):
        leaf = l
        break
    flat = jnp.ravel(leaf)[0]
    return float(np.asarray(flat))


def main():
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.llm import (
        LLMConfig,
        SamplingParams,
        generate,
        init_params,
    )
    from rlinf_tpu.training.learner import PolicyLossConfig, make_policy_train_step
    from rlinf_tpu.training.train_state import (
        OptimizerConfig,
        create_train_state,
        make_optimizer,
    )
    from rlinf_tpu.utils import flops as F

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    # Auto-detect the attached chip's roofline (VERDICT r3 weak #4: a
    # hardcoded v5e denominator is silently wrong on v5p/v6e).
    from rlinf_tpu.utils.chips import detect_chip

    c = detect_chip(default="v5e")
    chip = F.ChipSpec(
        name=c.name, bf16_flops=c.bf16_flops, hbm_bw=c.hbm_bw,
        hbm_bytes=c.hbm_bytes,
    )

    # ---------------- on-chip parity gate ----------------
    # Perf numbers for a configuration that computes the wrong thing are
    # meaningless (round-2 lesson: the 0.59x SOL headline was measured
    # through a miscompiled decode path). Gate the kernels used below in
    # their jitted contexts; refuse to report on failure.
    # RLINF_BENCH_PARITY=off skips (development only), =full adds the
    # engine-level checks (slow: several extra engine compiles).
    parity_mode = os.environ.get("RLINF_BENCH_PARITY", "fast")
    if on_tpu and parity_mode != "off":
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests", "tpu"))
        from test_onchip_parity import run_all

        subset = None if parity_mode == "full" else {
            "decode_kernel", "decode_in_model", "flash_train_step",
            "q8_generate", "fused_ce", "fused_sampler",
            "megakernel_generate",
        }
        gate = run_all(checks=subset)
        print(json.dumps({"parity_gate": gate}), file=sys.stderr)
        bad = [k for k, v in gate.items() if not v["ok"]]
        if bad:
            print(json.dumps({
                "metric": "rl_e2e_tokens_per_s", "value": 0.0,
                "unit": "tok/s/chip", "vs_baseline": 0.0,
                "error": f"on-chip parity gate failed: {bad}",
            }))
            sys.exit(1)

    if on_tpu:
        # RLINF_BENCH_MODEL picks the preset. Flagship since round 4:
        # qwen2_1_5b — the reference's own headline math-RL model
        # (BASELINE.md DeepSeek-R1-Distill-Qwen-1.5B) and the production
        # regime for this chip. The 0.5B remains measurable via env; its
        # per-step fixed costs (24 pallas decode calls ~24us each, scan
        # dispatch) are a ~26%-of-decode floor at B=64 that larger models
        # amortize — full attribution in docs/perf_notes_r4.md.
        preset = os.environ.get("RLINF_BENCH_MODEL", "qwen2_1_5b")
        cfg = getattr(LLMConfig, preset)()
        # One GRPO step's shapes: 64 rollouts of 256 prompt + 256 response
        # tokens, then training on the same rows (bucketed to 256 — the
        # committed math proof trains on <=256-token rows). Measured r3 on
        # v5e: train 0.48 MFU (B64 T256 beats B8 T1024's 0.36 — shorter
        # rows cut the quadratic attention share), decode 0.70x of its HBM
        # roofline.
        B_train, T_train = 64, 256
        B_gen, P_gen, N_gen = 64, 256, 256
        n_iters = 5
    else:  # CPU smoke mode for development
        cfg = LLMConfig.tiny()
        B_train, T_train = 4, 128
        B_gen, P_gen, N_gen = 4, 32, 32
        n_iters = 2

    rng = jax.random.PRNGKey(0)

    # ---------------- train phase ----------------
    # big presets need the factored optimizer to fit one chip's HBM
    big = on_tpu and cfg.num_params() > 1e9
    tx = make_optimizer(OptimizerConfig(
        lr=1e-6, name="adafactor" if big else "adamw",
    ))
    state = create_train_state(lambda r: init_params(cfg, r), tx, rng)
    # Round-5 production train config (see docs/perf_notes_r5.md): 4
    # no-remat microbatches kill the 4-pass remat tax (3 passes), the
    # unrolled layer loop avoids the scan-backward's stacked-weight
    # transposes, bf16 accumulation halves grad-residency+traffic, and the
    # fused Pallas linear-CE runs the lm-head loss phase at 0.84 eff.
    # Measured v5e 1.5B: 1.370 s (r4, full remat) -> 1.053 s, MFU 0.74.
    train_step = make_policy_train_step(
        cfg, PolicyLossConfig(logprob_chunk_size=256), tx,
        num_microbatches=4 if on_tpu else 1, remat=not on_tpu,
        unroll_layers=on_tpu, grad_acc_dtype=jnp.bfloat16 if on_tpu else None,
    )
    r = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B_train, T_train)), jnp.int32),
        "attention_mask": jnp.ones((B_train, T_train), bool),
        "target_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B_train, T_train)), jnp.int32),
        "loss_mask": jnp.ones((B_train, T_train), bool),
        "old_logprobs": jnp.asarray(r.normal(size=(B_train, T_train)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B_train, T_train)), jnp.float32),
    }
    state, m = train_step(state, batch)  # compile
    _sync(m)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = train_step(state, batch)
    _sync(m)
    train_time = (time.perf_counter() - t0) / n_iters
    train_tokens = B_train * T_train

    # ---------------- rollout phase ----------------
    # Production serving config: int8 weight-only decode params + packed
    # Pallas decode attention (quant.py documents the RL-correctness
    # argument; the runner recomputes training logprobs on bf16 weights).
    # Measured on v5e: int8+pallas 2.6 ms/step vs bf16+xla 4.3 ms/step at
    # B=64, P=N=256.
    from rlinf_tpu.models.llm import quantize_params

    params = state.params
    qparams = quantize_params(params) if on_tpu else None
    sp = SamplingParams(max_new_tokens=N_gen, temperature=1.0, eos_token_id=-1)
    # Round-5 production decode: the whole step runs as ONE pallas call
    # (ops/pallas/decode_megakernel.py — removes the ~24us/pallas_call x
    # layers launch floor and streams all int8 weights through one uniform
    # chunk window). Parity-gated by megakernel_generate above. Measured
    # v5e (B=64, P=N=256): 1.5B 1.579 -> 1.394s; 0.5B 0.746 -> 0.625s.
    mega = None
    if on_tpu and not cfg.is_moe and not cfg.qk_norm:
        from rlinf_tpu.ops.pallas.decode_megakernel import pack_decode_weights

        plan, mega_w = pack_decode_weights(qparams, cfg)
        mega = True
    gen = jax.jit(
        lambda p, qp, mw, rng, ids, mask: generate(
            p, cfg, rng, ids, mask, sp, decode_params=qp,
            decode_attn_impl="pallas" if on_tpu else None,
            # int8 KV cache (quantize-on-write, q8 pallas kernel) — halves
            # cache traffic; parity-gated by the q8_generate check above
            kv_quant="int8" if on_tpu else "none",
            mega=(plan, mw) if mega else None,
        )
    ) if mega else jax.jit(
        lambda p, qp, mw, rng, ids, mask: generate(
            p, cfg, rng, ids, mask, sp, decode_params=qp,
            decode_attn_impl="pallas" if on_tpu else None,
            kv_quant="int8" if on_tpu else "none",
        )
    )
    mega_w = mega_w if mega else None
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B_gen, P_gen)), jnp.int32)
    mask = jnp.ones((B_gen, P_gen), bool)
    # Warm to steady state before timing: the first executions of a fresh
    # executable run ~1.8x slower on the tunneled chip (measured ramp
    # 1.20s -> 0.67s for identical calls); serving throughput is the
    # steady-state number.
    out = gen(params, qparams, mega_w, rng, ids, mask)  # compile
    _sync(out.response_ids)
    for w in range(3):
        out = gen(params, qparams, mega_w, jax.random.fold_in(rng, 100 + w), ids, mask)
    _sync(out.response_ids)
    t0 = time.perf_counter()
    for _ in range(max(n_iters // 2, 1)):
        out = gen(params, qparams, mega_w, jax.random.fold_in(rng, 1), ids, mask)
    _sync(out.response_ids)
    gen_time = (time.perf_counter() - t0) / max(n_iters // 2, 1)
    gen_tokens = B_gen * N_gen

    # ---------------- roofline + report ----------------
    total_tokens = gen_tokens + train_tokens
    total_time = gen_time + train_time
    value = total_tokens / total_time

    sol_train = F.train_sol_time(cfg, chip, B_train, T_train)
    sol_prefill = F.prefill_flops(cfg, B_gen, P_gen) / chip.bf16_flops
    sol_decode = sum(
        F.decode_sol_time(cfg, chip, B_gen, P_gen + t) for t in range(N_gen)
    )
    sol_time = sol_train + sol_prefill + sol_decode
    vs_baseline = (sol_time / total_time) if on_tpu else 0.0

    detail = {
        "train_time_s": round(train_time, 4),
        "train_mfu": round(F.train_mfu(cfg, chip, B_train, T_train, train_time), 4)
        if on_tpu else None,
        "gen_time_s": round(gen_time, 4),
        "gen_tokens_per_s": round(gen_tokens / gen_time, 1),
        "sol_time_s": round(sol_time, 4),
        "platform": dev.platform,
    }
    print(json.dumps(detail), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "rl_e2e_tokens_per_s",
                "value": round(value, 2),
                "unit": "tok/s/chip",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
