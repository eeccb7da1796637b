"""Direct lm-head CE phase micro-bench: fused Pallas kernel vs chunked XLA.

Measures value_and_grad of a logprob+entropy scalar loss over fixed hidden
states at the flagship geometry (rows = B*T of the bench train step).
Usage: profile_ce.py [pallas|xla] [model] [rows]
"""

import json
import sys
import time

import numpy as np


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    preset = sys.argv[2] if len(sys.argv) > 2 else "qwen2_1_5b"
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 16384

    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.llm import LLMConfig
    from rlinf_tpu.ops.logprobs import fused_linear_logprobs_and_entropy
    from rlinf_tpu.ops.pallas.linear_ce import fused_linear_ce
    from rlinf_tpu.utils.chips import detect_chip

    cfg = getattr(LLMConfig, preset)()
    D, V = cfg.hidden_size, cfg.vocab_size
    r = np.random.default_rng(0)
    h = jnp.asarray(r.normal(size=(rows, D)) * 0.5, jnp.bfloat16)
    emb = jnp.asarray(r.normal(size=(V, D)) * 0.02, jnp.bfloat16)
    tgt = jnp.asarray(r.integers(0, V, (rows,)), jnp.int32)
    adv = jnp.asarray(r.normal(size=(rows,)), jnp.float32)

    if impl == "pallas":
        def loss(h, emb):
            lp, ent = fused_linear_ce(h, emb, tgt, w_layout="vd")
            return jnp.mean(lp * adv) + 0.0 * jnp.mean(ent)
    else:
        def loss(h, emb):
            lp, ent = fused_linear_logprobs_and_entropy(
                h[None], emb.T, tgt[None], chunk_size=4096
            )
            return jnp.mean(lp * adv) + 0.0 * jnp.mean(ent)

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    out = g(h, emb)
    float(np.asarray(out[0]))
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        out = g(h, emb)
    float(np.asarray(out[0]))
    t = (time.perf_counter() - t0) / iters
    c = detect_chip(default="v5e")
    # 4 matmul passes of 2*D*V per row (fwd, recompute, dh, dw)
    flops = 4 * 2 * D * V * rows
    print(json.dumps({
        "phase": "ce_grad", "impl": impl, "model": preset, "rows": rows,
        "time_s": round(t, 4),
        "eff_vs_4pass": round(flops / c.bf16_flops / t, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
