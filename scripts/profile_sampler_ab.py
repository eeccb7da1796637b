"""A/B: generate with fused vs xla sampler; plus standalone sampler cost."""
import json, sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params, quantize_params)

    cfg = LLMConfig.qwen2_1_5b()
    r = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)
    params = init_params(cfg, rng)
    qparams = quantize_params(params)
    B, P, N = 64, 256, 64
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), bool)
    sp = SamplingParams(max_new_tokens=N, temperature=1.0, eos_token_id=-1)

    for impl in ("xla", "fused"):
        gen = jax.jit(lambda p, qp, rg, i, m, impl=impl: generate(
            p, cfg, rg, i, m, sp, decode_params=qp,
            decode_attn_impl="pallas", kv_quant="int8", sampler_impl=impl))
        out = gen(params, qparams, rng, ids, mask)
        float(np.asarray(jnp.ravel(out.response_ids)[0]))
        for w in range(2):
            out = gen(params, qparams, jax.random.fold_in(rng, w), ids, mask)
        float(np.asarray(jnp.ravel(out.response_ids)[0]))
        t0 = time.perf_counter(); iters = 3
        for i in range(iters):
            out = gen(params, qparams, jax.random.fold_in(rng, 9+i), ids, mask)
        float(np.asarray(jnp.ravel(out.response_ids)[0]))
        t = (time.perf_counter() - t0) / iters
        print(json.dumps({"phase": "gen_ab", "sampler": impl, "N": N,
                          "time_s": round(t, 4)}), flush=True)

    # standalone: hidden -> (tok, lp), fused kernel vs xla ops
    from rlinf_tpu.ops.pallas.sampler_kernel import fused_lmhead_sample
    from rlinf_tpu.models.llm.sampler import sample_from_logits
    from rlinf_tpu.models.llm import model as M
    h = jnp.asarray(r.normal(size=(B, cfg.hidden_size)) * 0.4, jnp.bfloat16)
    lm = qparams["lm_head"]
    f1 = jax.jit(lambda h, q, s: fused_lmhead_sample(h, q, s, jnp.int32(5)))
    o = f1(h, lm.q, lm.scale); float(np.asarray(o[0][0]))
    t0 = time.perf_counter()
    for _ in range(20): o = f1(h, lm.q, lm.scale)
    float(np.asarray(o[0][0]))
    print(json.dumps({"phase": "sampler_standalone", "impl": "fused",
                      "ms": round((time.perf_counter()-t0)/20*1e3, 3)}), flush=True)

    def xla_path(h, rg):
        logits = M.lm_head_logits(qparams, cfg, h)
        return sample_from_logits(rg, logits, sp)
    f2 = jax.jit(xla_path)
    o = f2(h, rng); float(np.asarray(o[0][0]))
    t0 = time.perf_counter()
    for _ in range(20): o = f2(h, rng)
    float(np.asarray(o[0][0]))
    print(json.dumps({"phase": "sampler_standalone", "impl": "xla",
                      "ms": round((time.perf_counter()-t0)/20*1e3, 3)}), flush=True)

if __name__ == "__main__":
    main()
