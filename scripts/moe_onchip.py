"""MoE on the real chip (VERDICT r4 item 2): parity + train MFU + decode.

Runs the qwen3_moe_2b preset (same family shape as the reference's MoE CI
model, reference tests/e2e_tests/reasoning/qwen3-moe-2.5b-*.yaml top-2
routing; scaled to one 16 GB v5e) through:

  1. the on-chip MoE parity rows (dropless ragged_dot + capacity einsum vs
     a dense all-experts oracle) — appended to logs/onchip_parity.json by
     the caller,
  2. a GRPO train step (dropless dispatch) -> MFU on ACTIVE flops,
  3. static-batch decode (bf16 weights, int8 KV, pallas attention)
     -> tok/s and vs_sol on the all-experts byte roofline.

Emits jsonl progressively for background polling.
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


def run_parity():
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "tpu"))
    from test_onchip_parity import run_all

    gate = run_all(checks={"moe_layer"})
    emit(phase="parity", **gate)
    if not all(v["ok"] for v in gate.values()):
        raise SystemExit(1)


def main():
    """Phase-per-process orchestration (deferred-execution allocators hold
    phase residue; vla_fullscale.py lesson): parity / train / decode run in
    fresh processes."""
    import subprocess

    which = sys.argv[1] if len(sys.argv) > 1 else None
    if which is None:
        import time as _time

        for ph in ("parity", "train", "decode"):
            # settle gap: a just-exited client's chip claim lingers on the
            # axon runtime for tens of seconds; starting the next phase too
            # early intermittently fails allocations (InvalidArgument)
            _time.sleep(45)
            for attempt in range(3):
                rc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), ph]
                ).returncode
                if rc == 0:
                    break
                emit(phase="retry", which=ph, attempt=attempt + 1)
                _time.sleep(90)
            if rc != 0:
                emit(phase="abort", reason=f"{ph} failed rc={rc}")
                return
        emit(phase="done")
        return
    import jax

    assert jax.default_backend() == "tpu", "run on the TPU host"
    if which == "parity":
        run_parity()
        return

    import jax.numpy as jnp

    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params,
    )
    from rlinf_tpu.training.learner import (
        PolicyLossConfig, make_policy_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )
    from rlinf_tpu.utils import flops as F
    from rlinf_tpu.utils.chips import detect_chip

    import dataclasses

    cfg = dataclasses.replace(LLMConfig.qwen3_moe_2b(), moe_impl="dropless")
    c = detect_chip(default="v5e")
    chip = F.ChipSpec(name=c.name, bf16_flops=c.bf16_flops, hbm_bw=c.hbm_bw,
                      hbm_bytes=c.hbm_bytes)
    emit(phase="config", params_b=round(cfg.num_params() / 1e9, 3),
         active_flops_per_tok=F.model_matmul_flops_per_token(cfg))

    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)

    if which == "decode":
        run_decode(cfg, chip, rng, r, jnp, jax)
        return

    # ---------------- train MFU ----------------
    # B=16: buffer donation is reported unusable on this backend (r4 verify
    # notes), so args+outputs (2 x 4.07GB state) stay live alongside the
    # backward's ~6.4GB temps — B=32 tips the 16GB chip over at L=24.
    B, T = 16, 256
    tx = make_optimizer(OptimizerConfig(lr=1e-6, name="adafactor"))
    state = create_train_state(lambda rg: init_params(cfg, rg), tx, rng)
    batch = {
        "input_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "target_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "loss_mask": jnp.ones((B, T), bool),
        "old_logprobs": jnp.asarray(r.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)), jnp.float32),
    }
    ok = False
    for variant, kw in (
        ("remat", dict(num_microbatches=1, remat=True)),
        ("mb4_noremat", dict(num_microbatches=4, remat=False,
                             unroll_layers=True,
                             grad_acc_dtype=jnp.bfloat16)),
    ):
        if ok:
            break  # one good MFU number per process; residue-free
        try:
            step = make_policy_train_step(
                cfg, PolicyLossConfig(logprob_chunk_size=256), tx, **kw)
            # CHAIN the state and sync each iteration: donation is unusable
            # on this backend and frees are deferred, so a no-sync loop
            # from the same input state keeps THREE ~4GB state copies live
            # at once and OOMs (surfacing as InvalidArgument)
            s2, m = step(state, batch)
            sync(m)
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                s2, m = step(s2, batch)
                sync(m)
            t = (time.perf_counter() - t0) / iters
            emit(phase="train", variant=variant, time_s=round(t, 4),
                 mfu=round(F.train_mfu(cfg, chip, B, T, t), 4),
                 loss_finite=bool(np.isfinite(sync(m))))
            ok = True
            del s2
        except Exception as e:
            emit(phase="train", variant=variant,
                 error=f"{type(e).__name__}: {str(e)[:200]}")
    del state
    if not ok:
        raise SystemExit(1)
    return


def run_decode(cfg, chip, rng, r, jnp, jax):
    from rlinf_tpu.models.llm import SamplingParams, generate, init_params
    from rlinf_tpu.utils import flops as F

    # ---------------- decode ----------------
    params = init_params(cfg, rng)
    Bg, P, N = 64, 256, 128
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (Bg, P)), jnp.int32)
    mask = jnp.ones((Bg, P), bool)
    sp = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1)
    gen = jax.jit(lambda p, rg, i, m: generate(
        p, cfg, rg, i, m, sp, decode_attn_impl="pallas", kv_quant="int8"))
    out = gen(params, rng, ids, mask)
    sync(out.response_ids)
    for w in range(2):
        out = gen(params, jax.random.fold_in(rng, w), ids, mask)
    sync(out.response_ids)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        out = gen(params, jax.random.fold_in(rng, 10 + i), ids, mask)
    sync(out.response_ids)
    t = (time.perf_counter() - t0) / iters
    sol = (F.prefill_flops(cfg, Bg, P) / chip.bf16_flops
           + sum(F.decode_sol_time(cfg, chip, Bg, P + k) for k in range(N)))
    emit(phase="decode", time_s=round(t, 4),
         tokens_per_s=round(Bg * N / t, 1), vs_sol=round(sol / t, 4))


if __name__ == "__main__":
    main()
