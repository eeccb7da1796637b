"""Per-phase attribution of the flagship bench gap (VERDICT r3 weak #2).

Runs train-step and decode variants on the real chip, one at a time, and
writes one JSON line per measurement to stdout (tee to logs/). Each phase is
timed with a scalar host fetch (the axon tunnel defers execution until a
fetch — see bench.py:_sync).

Usage: setsid nohup python scripts/profile_r4.py > logs/profile_r4.jsonl 2> logs/profile_r4.err &
"""

import json
import sys
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
    from rlinf_tpu.training.learner import (
        PolicyLossConfig, make_policy_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )
    from rlinf_tpu.utils import flops as F

    cfg = LLMConfig.qwen2_0_5b()
    chip = F.ChipSpec.v5e()
    B, T = 64, 256
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)

    batch = {
        "input_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "target_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "loss_mask": jnp.ones((B, T), bool),
        "old_logprobs": jnp.asarray(r.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)), jnp.float32),
    }

    def timeit(fn, *args, iters=4):
        out = fn(*args)
        sync(out)
        out = fn(*args)  # discard slow-start execution
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    params = init_params(cfg, rng)

    # ---- forward only (no remat, flash attn off/on) ----
    for attn in ("xla", "flash"):
        f = jax.jit(lambda p, b: M.forward_hidden(
            p, cfg, b["input_ids"], attention_mask=b["attention_mask"],
            attn_impl=attn)[0])
        try:
            t = timeit(f, params, batch)
            emit(phase="fwd_only", attn=attn, time_s=round(t, 4))
        except Exception as e:  # noqa: BLE001
            emit(phase="fwd_only", attn=attn, error=str(e)[:200])

    # ---- value_and_grad variants (no optimizer) ----
    sol = F.train_sol_time(cfg, chip, B, T)
    emit(phase="sol", train_sol_s=round(sol, 4))
    from rlinf_tpu.algorithms.losses import compute_ppo_actor_loss
    from rlinf_tpu.ops.logprobs import fused_linear_logprobs_and_entropy

    def make_grad(remat, chunk, attn):
        def loss_fn(p, b):
            hidden, _ = M.forward_hidden(
                p, cfg, b["input_ids"], attention_mask=b["attention_mask"],
                attn_impl=attn, remat=remat)
            w = M.lm_head_weight(p, cfg)
            lp, ent = fused_linear_logprobs_and_entropy(
                hidden, w, b["target_ids"], chunk_size=chunk)
            loss, _ = compute_ppo_actor_loss(
                logprobs=lp, old_logprobs=b["old_logprobs"],
                advantages=b["advantages"], loss_mask=b["loss_mask"],
                clip_ratio_low=0.2, clip_ratio_high=0.2)
            return loss

        return jax.jit(lambda p, b: jax.grad(loss_fn)(p, b))

    for remat in (True, "dots", False):
        for chunk in (256, 1024):
            for attn in ("flash", "xla"):
                try:
                    g = make_grad(remat, chunk, attn)
                    t = timeit(g, params, batch)
                    emit(phase="grad", remat=str(remat), chunk=chunk,
                         attn=attn, time_s=round(t, 4),
                         mfu=round(sol / t * 1.0, 4))
                except Exception as e:  # noqa: BLE001
                    emit(phase="grad", remat=str(remat), chunk=chunk,
                         attn=attn, error=str(e)[:200])

    # ---- optimizer update alone ----
    tx = make_optimizer(OptimizerConfig(lr=1e-6))
    state = create_train_state(lambda rr: init_params(cfg, rr), tx, rng)
    zgrads = jax.tree_util.tree_map(
        lambda p: jnp.ones(p.shape, jnp.float32) * 1e-6, state.params)

    @jax.jit
    def opt_only(state, grads):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)).astype(p.dtype),
            state.params, updates)
        from rlinf_tpu.training.train_state import TrainState
        return TrainState(state.step + 1, new_params, new_opt)

    t = timeit(lambda s: opt_only(s, zgrads), state, iters=4)
    emit(phase="opt_only", time_s=round(t, 4))

    # ---- full train step, best candidates ----
    for remat, chunk, attn in ((True, 256, "xla"), ("dots", 1024, "flash"),
                               (False, 1024, "flash")):
        try:
            ts = make_policy_train_step(
                cfg, PolicyLossConfig(logprob_chunk_size=chunk), tx,
                remat=remat, attn_impl=attn)
            st = create_train_state(lambda rr: init_params(cfg, rr), tx, rng)

            def run(s, b):
                return ts(s, b)

            # donation: rebuild state each call is wrong; time statefully
            st, m = ts(st, batch)
            sync(m)
            t0 = time.perf_counter()
            iters = 4
            for _ in range(iters):
                st, m = ts(st, batch)
            sync(m)
            t = (time.perf_counter() - t0) / iters
            emit(phase="train_step", remat=str(remat), chunk=chunk, attn=attn,
                 time_s=round(t, 4), mfu=round(sol / t, 4))
        except Exception as e:  # noqa: BLE001
            emit(phase="train_step", remat=str(remat), chunk=chunk, attn=attn,
                 error=str(e)[:200])

    # ---- decode attribution ----
    B_gen, P, N = 64, 256, 128
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B_gen, P)), jnp.int32)
    mask = jnp.ones((B_gen, P), bool)
    qparams = quantize_params(params)

    sol_prefill = F.prefill_flops(cfg, B_gen, P) / chip.bf16_flops
    sol_dec = sum(F.decode_sol_time(cfg, chip, B_gen, P + t) for t in range(N))
    emit(phase="decode_sol", prefill_s=round(sol_prefill, 4),
         decode_s=round(sol_dec, 4), n_new=N)

    # prefill alone
    pf = jax.jit(lambda p, i, m: M.prefill(p, cfg, i, m, P + N)[0])
    t = timeit(pf, params, ids, mask)
    emit(phase="prefill_only", time_s=round(t, 4))

    variants = [
        ("int8_pallas", dict(decode_params=qparams, decode_attn_impl="pallas")),
        ("bf16_pallas", dict(decode_params=None, decode_attn_impl="pallas")),
        ("int8_xla", dict(decode_params=qparams, decode_attn_impl=None)),
    ]
    for name, kw in variants:
        sp = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1)
        gen = jax.jit(lambda p, rg, i, m: generate(
            p, cfg, rg, i, m, sp, **kw))
        try:
            t = timeit(lambda p, rg, i, m: gen(p, rg, i, m).response_ids,
                       params, rng, ids, mask, iters=2)
            per_step = (t - 0) / N
            emit(phase="generate", variant=name, time_s=round(t, 4),
                 ms_per_step=round(per_step * 1e3, 3),
                 vs_sol=round((sol_prefill + sol_dec) / t, 4))
        except Exception as e:  # noqa: BLE001
            emit(phase="generate", variant=name, error=str(e)[:300])

    # greedy vs sampled (isolates gumbel + filtering cost)
    spg = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1,
                         greedy=True)
    geng = jax.jit(lambda p, rg, i, m: generate(
        p, cfg, rg, i, m, spg, decode_params=qparams,
        decode_attn_impl="pallas"))
    t = timeit(lambda p, rg, i, m: geng(p, rg, i, m).response_ids,
               params, rng, ids, mask, iters=2)
    emit(phase="generate", variant="int8_pallas_greedy", time_s=round(t, 4),
         ms_per_step=round(t / N * 1e3, 3))

    emit(phase="done")


if __name__ == "__main__":
    main()
