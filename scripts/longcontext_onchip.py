"""Long-context training regime on the real chip (VERDICT r4 item 3).

The reference trains math-RL at rollout seq len 20480 with CP/SP +
token-budget microbatching (reference rlinf_system.rst:80,
rlinf/utils/data_iter_utils.py:447-487). This proves the composed regime on
one v5e with the 1.5B flagship:

  1. PARITY: the long-T path (flash attention + remat + fused linear-CE)
     computes the same loss/grad-norm as the T=256 bench path on overlapping
     data (rows valid only in their first 256 tokens);
  2. TRAIN MFU at T=8192 (B=8, 65k tokens/step) and T=16384 (B=4), with
     token-budget accounting vs the same roofline as bench.py;
  3. BFD DYNAMIC BATCHING: mixed 1k-8k rows packed under a 16384-token
     budget (data/dynamic_batching.pack_microbatches + the grad-accumulate /
     apply split with global valid-token normalization);
  4. LONG ROLLOUT: int8-weight + int8-KV generation at S_max 8192
     (P=4096 -> N=4096), tok/s.

Writes logs/longcontext_r5.json. Emits jsonl progressively.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0].astype(jnp.float32)))


def emit(**kw):
    print(json.dumps(kw), flush=True)
    RESULTS.update(kw)


def _batch(cfg, B, T, valid_to=None, rng_seed=0):
    import jax.numpy as jnp

    r = np.random.default_rng(rng_seed)
    mask = np.ones((B, T), bool)
    if valid_to is not None:
        mask[:, valid_to:] = False
    return {
        "input_ids": jnp.asarray(
            r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.asarray(mask),
        "target_ids": jnp.asarray(
            r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "loss_mask": jnp.asarray(mask),
        "old_logprobs": jnp.asarray(
            r.normal(size=(B, T)) * 0.1 * mask, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)) * mask, jnp.float32),
    }


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "run on the TPU host"

    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params, quantize_params,
    )
    from rlinf_tpu.training.learner import (
        PolicyLossConfig, make_policy_grad_and_apply, make_policy_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )
    from rlinf_tpu.utils import flops as F
    from rlinf_tpu.utils.chips import detect_chip

    cfg = LLMConfig.qwen2_1_5b()
    c = detect_chip(default="v5e")
    chip = F.ChipSpec(name=c.name, bf16_flops=c.bf16_flops, hbm_bw=c.hbm_bw,
                      hbm_bytes=c.hbm_bytes)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(OptimizerConfig(lr=1e-6, name="adafactor"))
    state = create_train_state(lambda r: init_params(cfg, r), tx, rng)
    loss_cfg = PolicyLossConfig(logprob_chunk_size=256)

    # ---------------- 1. parity long-T vs T=256 path --------------------
    B = 4
    short = make_policy_train_step(
        cfg, loss_cfg, tx, num_microbatches=1, remat=True, attn_impl="xla")
    long_ = make_policy_train_step(
        cfg, loss_cfg, tx, num_microbatches=2, remat=True,
        grad_acc_dtype=jnp.bfloat16, attn_impl="pallas")
    b256 = _batch(cfg, B, 256, rng_seed=3)
    b8k = _batch(cfg, B, 8192, valid_to=256, rng_seed=3)
    # same data in the valid region
    for k in b256:
        b8k[k] = b8k[k].at[:, :256].set(b256[k]) if b8k[k].ndim == 2 else b8k[k]
    # train steps DONATE their input state; give the short path a copy so
    # both paths grade the same params
    state_copy = jax.tree_util.tree_map(jnp.copy, state)
    _, m_s = short(state_copy, b256)
    loss_s, gn_s = sync(m_s["actor/loss"]), sync(m_s["actor/grad_norm"])
    # donation is unusable on this backend: the copy survives the short
    # step — drop it (and flush deferred frees) before the long step
    del state_copy, m_s
    sync(jnp.zeros(()))
    state, m_l = long_(state, b8k)
    loss_l, gn_l = sync(m_l["actor/loss"]), sync(m_l["actor/grad_norm"])
    lrel = abs(loss_l - loss_s) / max(abs(loss_s), 1e-9)
    grel = abs(gn_l - gn_s) / max(abs(gn_s), 1e-9)
    emit(parity_loss_rel=round(lrel, 5), parity_gradnorm_rel=round(grel, 5),
         parity_ok=bool(lrel < 2e-2 and grel < 5e-2))

    # ---------------- 2. train MFU at 8k / 16k --------------------------
    # full remat is the long-context memory regime: "dots" keeps ~0.8GB of
    # matmul activations PER LAYER at 16k-token microbatches (26GB program)
    for B_l, T_l, variants in (
        (8, 8192, (
            ("remat_mb4", dict(num_microbatches=4, remat=True,
                               grad_acc_dtype=jnp.bfloat16)),
        )),
        (4, 16384, (
            ("remat_mb4", dict(num_microbatches=4, remat=True,
                               grad_acc_dtype=jnp.bfloat16)),
        )),
    ):
        for name, kw in variants:
            try:
                bb = _batch(cfg, B_l, T_l, rng_seed=1)
                step = make_policy_train_step(
                    cfg, loss_cfg, tx, attn_impl="pallas", **kw)
                # steps DONATE their input: chain the state and sync each
                # iteration (deferred frees otherwise stack 3 state copies)
                state, m = step(state, bb)
                sync(m)
                t0 = time.perf_counter()
                iters = 3
                for _ in range(iters):
                    state, m = step(state, bb)
                    sync(m)
                t = (time.perf_counter() - t0) / iters
                mfu = F.train_mfu(cfg, chip, B_l, T_l, t)
                emit(**{f"train_T{T_l}_{name}_s": round(t, 3),
                        f"train_T{T_l}_{name}_mfu": round(mfu, 4),
                        f"train_T{T_l}_{name}_tok_s":
                            round(B_l * T_l / t, 1)})
                del m, bb
                sync(jnp.zeros(()))
                break  # first fitting variant is the production config
            except Exception as e:
                emit(**{f"train_T{T_l}_{name}_error":
                        f"{type(e).__name__}: {str(e)[:160]}"})

    # ---------------- 3. BFD token-budget microbatching ------------------
    # RLINF_LC_SKIP_BFD=1 skips: the grad-accumulate/apply split holds TWO
    # full states (no donation on this backend) + the accumulator + long-T
    # backward transients — one v5e cannot hold all four at the 1.5B; the
    # partitioner + global-token-count equivalence are CPU-proven
    # (tests/test_learner_microbatch.py, tests/test_misc_components.py)
    skip_bfd = os.environ.get("RLINF_LC_SKIP_BFD") == "1"
    grad_step, apply_step, zero_grads = make_policy_grad_and_apply(
        cfg, loss_cfg, tx, remat=True, attn_impl="pallas",
        acc_dtype=jnp.bfloat16)
    from rlinf_tpu.data.dynamic_batching import pack_microbatches

    r = np.random.default_rng(7)
    B_mix, T_mix = 8, 8192
    lengths = r.integers(1024, 8192, B_mix)
    np_batch = {
        "input_ids": r.integers(0, cfg.vocab_size, (B_mix, T_mix)).astype(np.int32),
        "attention_mask": np.arange(T_mix)[None, :] < lengths[:, None],
        "target_ids": r.integers(0, cfg.vocab_size, (B_mix, T_mix)).astype(np.int32),
        "loss_mask": np.arange(T_mix)[None, :] < lengths[:, None],
        "old_logprobs": (r.normal(size=(B_mix, T_mix)) * 0.1).astype(np.float32),
        "advantages": r.normal(size=(B_mix, T_mix)).astype(np.float32),
    }
    # coarse seq bucketing bounds the distinct (rows, T) shapes — each is
    # a separate ~minutes-long tunnel compile
    mbs = pack_microbatches(np_batch, lengths, 16384, seq_bucket=2048)
    global_valid = jnp.asarray(float(np_batch["loss_mask"].sum()), jnp.float32)

    def one_update():
        grads = zero_grads(state.params)
        for mb in mbs:
            mb_j = {k: jnp.asarray(v) for k, v in mb.items()}
            grads, loss, _ = grad_step(state.params, grads, mb_j, global_valid)
        st, gn = apply_step(state, grads)
        return st, gn

    try:
        if skip_bfd:
            raise RuntimeError("skipped (RLINF_LC_SKIP_BFD=1)")
        st, gn = one_update()  # compile all shape buckets
        sync(gn)
        t0 = time.perf_counter()
        iters = 2
        for _ in range(iters):
            st, gn = one_update()
            sync(gn)
        t = (time.perf_counter() - t0) / iters
        total_tokens = int(lengths.sum())
        emit(bfd_n_microbatches=len(mbs),
             bfd_valid_tokens=total_tokens,
             bfd_update_s=round(t, 3),
             bfd_tok_s=round(total_tokens / t, 1),
             bfd_gradnorm_finite=bool(np.isfinite(sync(gn))))
        del st, gn
    except Exception as e:
        emit(bfd_error=f"{type(e).__name__}: {str(e)[:160]}")
    del grad_step, apply_step

    # ---------------- 4. long rollout ------------------------------------
    params = state.params
    del state
    qparams = quantize_params(params)
    Bg, P, N = 8, 4096, 4096
    rr = np.random.default_rng(2)
    ids = jnp.asarray(rr.integers(0, cfg.vocab_size, (Bg, P)), jnp.int32)
    mask = jnp.ones((Bg, P), bool)
    sp = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1)
    gen = jax.jit(lambda p, qp, rg, i, m: generate(
        p, cfg, rg, i, m, sp, attn_impl="pallas", decode_params=qp,
        decode_attn_impl="pallas", kv_quant="int8"))
    try:
        out = gen(params, qparams, rng, ids, mask)
        sync(out.response_ids)
        out = gen(params, qparams, jax.random.fold_in(rng, 1), ids, mask)
        sync(out.response_ids)
        t0 = time.perf_counter()
        iters = 2
        for i in range(iters):
            out = gen(params, qparams, jax.random.fold_in(rng, 5 + i), ids,
                      mask)
            sync(out.response_ids)
        t = (time.perf_counter() - t0) / iters
        sol = (F.prefill_flops(cfg, Bg, P) / chip.bf16_flops + sum(
            F.decode_sol_time(cfg, chip, Bg, P + k) for k in range(N)))
        emit(rollout_S8192_s=round(t, 3),
             rollout_S8192_tok_s=round(Bg * N / t, 1),
             rollout_S8192_vs_sol=round(sol / t, 4))
    except Exception as e:
        emit(rollout_error=f"{type(e).__name__}: {str(e)[:160]}")

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "logs", "longcontext_r5.json"),
            "w") as f:
        json.dump(RESULTS, f, indent=1)
    emit(phase="done")


if __name__ == "__main__":
    main()
