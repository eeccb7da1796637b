"""One train-step variant per fresh process (HBM state pollution made the
in-process sweep OOM).
Usage: profile_train_mb.py <n_mb> <remat> <model> [unroll] [acc_dtype]"""

import json
import sys
import time

import numpy as np


def main():
    n_mb = int(sys.argv[1])
    remat = {"True": True, "False": False, "dots": "dots"}[sys.argv[2]]
    preset = sys.argv[3] if len(sys.argv) > 3 else "qwen2_0_5b"
    unroll = len(sys.argv) > 4 and sys.argv[4] == "unroll"
    acc_dtype = sys.argv[5] if len(sys.argv) > 5 else None

    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.training.learner import (
        PolicyLossConfig, make_policy_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )
    from rlinf_tpu.utils import flops as F

    cfg = getattr(LLMConfig, preset)()
    chip = F.ChipSpec.v5e()
    B, T = 64, 256
    sol = F.train_sol_time(cfg, chip, B, T)
    r = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "target_ids": jnp.asarray(r.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "loss_mask": jnp.ones((B, T), bool),
        "old_logprobs": jnp.asarray(r.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(r.normal(size=(B, T)), jnp.float32),
    }
    big = cfg.num_params() > 1e9
    tx = make_optimizer(OptimizerConfig(
        lr=1e-6, name="adafactor" if big else "adamw"))
    ts = make_policy_train_step(
        cfg, PolicyLossConfig(logprob_chunk_size=256), tx,
        num_microbatches=n_mb, remat=remat, unroll_layers=unroll,
        grad_acc_dtype=jnp.bfloat16 if acc_dtype == "bf16" else None)
    st = create_train_state(
        lambda rr: init_params(cfg, rr), tx, jax.random.PRNGKey(0))
    st, m = ts(st, batch)
    loss = float(np.asarray(m["actor/loss"]))
    st, m = ts(st, batch)
    float(np.asarray(m["actor/loss"]))
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        st, m = ts(st, batch)
    float(np.asarray(m["actor/loss"]))
    t = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "phase": "train_step_mb", "model": preset, "n_mb": n_mb,
        "remat": str(remat), "unroll": unroll, "acc": acc_dtype or "f32",
        "time_s": round(t, 4),
        "mfu": round(sol / t, 4), "loss_finite": bool(np.isfinite(loss)),
    }), flush=True)


if __name__ == "__main__":
    main()
