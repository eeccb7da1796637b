"""Train-phase attribution round 2: lm-head share + microbatched no-remat.

Round-1 profile results (logs/profile_r4.jsonl): fwd-only 0.106s (0.78 of
SOL), full-remat grad 0.495s (0.50 MFU); no-remat / dots-remat at B=64 fail
to compile (activations exceed HBM). Hypotheses tested here:
  * lm-head fused-logprob phase runs at ~0.37 efficiency (f32 [B,S,V]
    materialization traffic) — measure grad WITHOUT the lm head;
  * microbatched scan (B16 per microbatch) admits remat=False => 3 passes
    instead of 4.
"""

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

    from rlinf_tpu.algorithms.losses import compute_ppo_actor_loss
    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.models.llm import model as M
    from rlinf_tpu.ops.logprobs import fused_linear_logprobs_and_entropy
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
    sol = F.train_sol_time(cfg, chip, B, T)

    batch = {
        "input_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "target_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "loss_mask": jnp.ones((B, T), bool),
        "old_logprobs": jnp.asarray(r.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)), jnp.float32),
    }
    params = init_params(cfg, rng)

    def timeit_stateless(fn, args, iters=3):
        out = fn(*args)
        sync(out)
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    # grad WITHOUT lm head (body only, remat=True)
    def body_loss(p, b):
        hidden, _ = M.forward_hidden(
            p, cfg, b["input_ids"], attention_mask=b["attention_mask"],
            attn_impl="xla", remat=True)
        return jnp.sum(hidden * b["advantages"][..., None]) * 1e-6

    g = jax.jit(lambda p, b: jax.grad(body_loss)(p, b))
    try:
        t = timeit_stateless(g, (params, batch))
        emit(phase="grad_body_only", remat="True", time_s=round(t, 4))
    except Exception as e:  # noqa: BLE001
        emit(phase="grad_body_only", error=str(e)[:200])
    del g
    gc.collect()

    # logprob-chunk sweep on the full grad (remat=True)
    def make_grad(chunk):
        def loss_fn(p, b):
            hidden, _ = M.forward_hidden(
                p, cfg, b["input_ids"], attention_mask=b["attention_mask"],
                attn_impl="xla", remat=True)
            w = M.lm_head_weight(p, cfg)
            lp, ent = fused_linear_logprobs_and_entropy(
                hidden, w, b["target_ids"], chunk_size=chunk)
            loss, _ = compute_ppo_actor_loss(
                logprobs=lp, old_logprobs=b["old_logprobs"],
                advantages=b["advantages"], loss_mask=b["loss_mask"],
                clip_ratio_low=0.2, clip_ratio_high=0.2)
            return loss
        return jax.jit(lambda p, b: jax.grad(loss_fn)(p, b))

    for chunk in (64, 128):
        try:
            g = make_grad(chunk)
            t = timeit_stateless(g, (params, batch))
            emit(phase="grad_chunk", chunk=chunk, time_s=round(t, 4),
                 mfu=round(sol / t, 4))
        except Exception as e:  # noqa: BLE001
            emit(phase="grad_chunk", chunk=chunk, error=str(e)[:200])
        gc.collect()

    del params
    gc.collect()

    # full train step: microbatched scan variants (grads live in the scan)
    tx = make_optimizer(OptimizerConfig(lr=1e-6))
    for n_mb, remat in ((4, False), (4, "dots"), (2, "dots"), (1, True)):
        try:
            ts = make_policy_train_step(
                cfg, PolicyLossConfig(logprob_chunk_size=256), tx,
                num_microbatches=n_mb, remat=remat)
            st = create_train_state(lambda rr: init_params(cfg, rr), tx, rng)
            st, m = ts(st, batch)
            sync(m)
            st, m = ts(st, batch)
            sync(m)
            t0 = time.perf_counter()
            iters = 4
            for _ in range(iters):
                st, m = ts(st, batch)
            sync(m)
            t = (time.perf_counter() - t0) / iters
            emit(phase="train_step_mb", n_mb=n_mb, remat=str(remat),
                 time_s=round(t, 4), mfu=round(sol / t, 4))
            del st, ts
        except Exception as e:  # noqa: BLE001
            emit(phase="train_step_mb", n_mb=n_mb, remat=str(remat),
                 error=str(e)[:200])
        gc.collect()

    emit(phase="done")


if __name__ == "__main__":
    main()
