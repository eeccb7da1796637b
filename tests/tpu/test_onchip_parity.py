"""ON-CHIP parity gates for every Pallas kernel in its real jit context.

Round-2 lesson (VERDICT weak #1): interpret-mode tests cannot catch Mosaic /
XLA:TPU miscompiles — the packed decode kernel's unpack epilogue produced
wrong output ONLY when jitted on the real chip (the silent TPU-default
rollout path), and 343 green CPU tests never noticed. These checks run the
kernels on the actual TPU inside the same jitted compositions the framework
uses, against their XLA oracles:

  * packed decode kernel (several GQA shapes + f32 + multi-block)
  * packed decode inside the full jitted model decode step
  * flash attention fwd+bwd inside make_policy_train_step
  * paged decode kernel
  * engine-level: static + continuous engines, pallas vs xla decode at
    identical params — greedy tokens must match and behavior logprobs must
    agree (the step-1 approx_kl ≈ 0 invariant)

Run directly on a TPU host:  python tests/tpu/test_onchip_parity.py
Under pytest the suite conftest forces CPU, so every test here self-skips —
the gate is executed by bench.py (which refuses to report perf for a
configuration that fails parity) and by the standalone main().
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

import pytest


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# checks (raise AssertionError with detail on failure)
# ---------------------------------------------------------------------------

def check_decode_kernel() -> dict:
    from rlinf_tpu.ops.pallas.decode_attention import (
        decode_attention_packed,
        decode_attention_packed_xla,
    )

    from rlinf_tpu.models.llm.model import _decode_block_config

    shapes = [
        # (B, S, H, Kv, Hd, block, rows, dtype) — block/rows None = use the
        # PRODUCTION chooser (_decode_block_config), the config engines run
        (8, 128, 4, 2, 64, 256, 8, jnp.bfloat16),
        (32, 512, 14, 2, 64, 512, 4, jnp.bfloat16),  # qwen2-0.5B geometry
        (8, 128, 4, 2, 64, 256, 8, jnp.float32),
        (16, 512, 8, 4, 64, 128, 8, jnp.bfloat16),   # multi-block streaming
        (64, 512, 12, 2, 128, None, None, jnp.bfloat16),  # qwen2-1.5B
        (32, 512, 16, 8, 128, None, None, jnp.bfloat16),  # qwen3 (KD=1024)
    ]
    worst = 0.0
    for B, S, H, Kv, Hd, blk, rows, dt in shapes:
        KD = Kv * Hd
        if blk is None:
            blk, rows = _decode_block_config(S, KD)
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, Hd), dt)
        kc = jax.random.normal(ks[1], (B, S, KD), dt) * 0.3
        vc = jax.random.normal(ks[2], (B, S, KD), dt) * 0.3
        starts = jnp.zeros((B,), jnp.int32)
        lengths = (jnp.arange(B, dtype=jnp.int32) % (S - 8)) + 5
        pf = jax.jit(functools.partial(
            decode_attention_packed, num_kv=Kv, block_size=blk,
            block_rows=rows))
        xf = jax.jit(functools.partial(decode_attention_packed_xla, num_kv=Kv))
        a = np.asarray(jax.device_get(pf(q, kc, vc, starts, lengths)), np.float32)
        b = np.asarray(jax.device_get(xf(q, kc, vc, starts, lengths)), np.float32)
        err = float(np.abs(a - b).max())
        worst = max(worst, err)
        assert err < 0.01, (
            f"decode kernel parity FAILED on-chip: shape {(B, S, H, Kv, Hd)} "
            f"dtype {dt.__name__} max_err {err:.5f}"
        )
    return {"max_err": worst, "shapes": len(shapes)}


def check_decode_in_model() -> dict:
    """The round-2 failure reproducer: qkv -> rope -> cache scatter ->
    packed attention, all in ONE jit — pallas vs xla must agree."""
    from rlinf_tpu.models.llm.model import (
        LLMConfig, decode_step_packed, init_params,
    )

    cfg = LLMConfig(
        vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=512, max_seq_len=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    B, S = 8, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    cache = tuple(
        (jax.random.normal(jax.random.fold_in(ks[0], i),
                           (B, S, cfg.kv_dim), jnp.bfloat16) * 0.3,
         jax.random.normal(jax.random.fold_in(ks[1], i),
                           (B, S, cfg.kv_dim), jnp.bfloat16) * 0.3)
        for i in range(cfg.num_layers)
    )
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B,), 0, 256)
    write_pos = jnp.arange(B, dtype=jnp.int32) + 40
    starts = jnp.zeros((B,), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("impl",))
    def step(params, cache, impl):
        h, _ = decode_step_packed(
            params, cfg, tokens, cache, write_pos, write_pos, starts,
            write_pos + 1, attn_impl=impl,
        )
        return h

    hx = np.asarray(jax.device_get(step(params, cache, "xla")), np.float32)
    hp = np.asarray(jax.device_get(step(params, cache, "pallas")), np.float32)
    err = float(np.abs(hx - hp).max())
    scale = float(np.abs(hx).max())
    assert err < 0.02 * max(scale, 1.0), (
        f"decode-in-model parity FAILED on-chip: max_err {err:.5f} at "
        f"scale {scale:.3f}"
    )
    return {"max_err": err, "scale": scale}


def check_flash_train_step() -> dict:
    """Flash attention fwd+bwd inside the real jitted train step."""
    from rlinf_tpu.models.llm.model import LLMConfig, init_params
    from rlinf_tpu.training.learner import (
        PolicyLossConfig, make_policy_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig, create_train_state, make_optimizer,
    )

    cfg = LLMConfig(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=512, max_seq_len=512,
    )
    tx = make_optimizer(OptimizerConfig(lr=1e-4))
    rng = np.random.default_rng(0)
    B, T = 4, 256
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 512, (B, T)), jnp.int32),
        "target_ids": jnp.asarray(rng.integers(0, 512, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), bool),
        "loss_mask": jnp.ones((B, T), bool),
        "old_logprobs": jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32),
        "advantages": jnp.asarray(rng.normal(size=(B, T)), jnp.float32),
    }
    out = {}
    for impl in ("xla", "pallas"):
        state = create_train_state(
            lambda r: init_params(cfg, r), tx, jax.random.PRNGKey(0)
        )
        step = make_policy_train_step(
            cfg, PolicyLossConfig(), tx, remat=True, attn_impl=impl
        )
        _, metrics = step(state, dict(batch))
        out[impl] = {
            k: float(np.asarray(v))
            for k, v in metrics.items()
            if k in ("actor/loss", "actor/grad_norm", "actor/entropy")
        }
    dl = abs(out["xla"]["actor/loss"] - out["pallas"]["actor/loss"])
    dg = abs(out["xla"]["actor/grad_norm"] - out["pallas"]["actor/grad_norm"])
    gscale = max(abs(out["xla"]["actor/grad_norm"]), 1e-6)
    assert dl < 0.02 and dg / gscale < 0.05, (
        f"flash train-step parity FAILED on-chip: dloss {dl:.5f}, "
        f"dgrad_norm rel {dg / gscale:.4f} ({out})"
    )
    return {"dloss": dl, "dgrad_rel": dg / gscale}


def check_paged_kernel() -> dict:
    from rlinf_tpu.ops.pallas.paged_attention import (
        paged_attention, paged_attention_xla,
    )

    B, H, Kv, Hd, P, n_pages, max_pages = 8, 4, 2, 64, 16, 64, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, Hd), jnp.bfloat16)
    kp = jax.random.normal(ks[1], (n_pages, Kv, P, Hd), jnp.bfloat16) * 0.3
    vp = jax.random.normal(ks[2], (n_pages, Kv, P, Hd), jnp.bfloat16) * 0.3
    table = jax.random.randint(ks[3], (B, max_pages), 0, n_pages)
    lengths = (jnp.arange(B, dtype=jnp.int32) * 13) % (P * max_pages - 2) + 1
    a = np.asarray(jax.device_get(jax.jit(paged_attention)(
        q, kp, vp, table, lengths)), np.float32)
    b = np.asarray(jax.device_get(jax.jit(paged_attention_xla)(
        q, kp, vp, table, lengths)), np.float32)
    err = float(np.abs(a - b).max())
    assert err < 0.01, f"paged kernel parity FAILED on-chip: max_err {err:.5f}"
    return {"max_err": err}


def _engine_parity(engine_name: str) -> dict:
    """Same params, greedy decode, pallas vs xla decode path: tokens must
    match; behavior logprobs must agree (engine-level approx_kl ≈ 0)."""
    from rlinf_tpu.data.io_struct import RolloutRequest
    from rlinf_tpu.models.llm.model import LLMConfig, init_params
    from rlinf_tpu.models.llm.sampler import SamplingParams

    cfg = LLMConfig(
        vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=512, max_seq_len=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(5))
    sp = SamplingParams(
        max_new_tokens=16, temperature=1.0, greedy=True, eos_token_id=-1
    )
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(2, 255, rng.integers(4, 30)))
               for _ in range(16)]
    request = RolloutRequest(
        prompt_ids=[[int(t) for t in p] for p in prompts],
        answers=[""] * len(prompts),
    )

    outs = {}
    for impl in ("xla", "pallas"):
        if engine_name == "static":
            from rlinf_tpu.rollout.engine import RolloutEngine

            eng = RolloutEngine(
                cfg, sp, prompt_bucket=32, decode_attn_impl=impl,
                weight_quant="none",
            )
        else:
            from rlinf_tpu.rollout.continuous_engine import (
                ContinuousBatchingEngine,
            )

            eng = ContinuousBatchingEngine(
                cfg, sp, num_slots=16, max_seq_len=64, prompt_bucket=32,
                decode_chunk=8, weight_quant="none", decode_attn_impl=impl,
            )
        outs[impl] = eng.rollout(params, request, jax.random.PRNGKey(0))

    a, b = outs["xla"], outs["pallas"]
    tok_match = float(np.mean(
        (a.response_ids == b.response_ids) | ~a.response_mask
    ))
    lp_diff = float(np.max(np.abs(
        np.where(a.response_mask, a.response_logprobs, 0.0)
        - np.where(b.response_mask, b.response_logprobs, 0.0)
    )))
    assert tok_match > 0.995, (
        f"{engine_name} engine greedy tokens diverge between decode impls: "
        f"match {tok_match:.4f}"
    )
    assert lp_diff < 0.02, (
        f"{engine_name} engine behavior logprobs diverge: max {lp_diff:.5f}"
    )
    return {"token_match": tok_match, "max_logprob_diff": lp_diff}


def check_static_engine() -> dict:
    return _engine_parity("static")


def check_continuous_engine() -> dict:
    return _engine_parity("continuous")


def check_mega_engine() -> dict:
    """Hybrid serving pool (use_mega='auto'): per-layer q8 kernels at the
    large pool size, megakernel with per-row RAGGED write positions after
    compaction relays the cache into stacked [L, B, S, KD] — vs the
    per-layer q8 engine end to end. Greedy tokens must bulk-agree (the
    megakernel's exact-f32 current-token attention is a deliberate
    precision upgrade, so near-ties may flip)."""
    from rlinf_tpu.data.io_struct import RolloutRequest
    from rlinf_tpu.models.llm.model import LLMConfig, init_params
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine

    cfg = LLMConfig(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=512, max_seq_len=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(3))
    sp = SamplingParams(max_new_tokens=32, greedy=True, eos_token_id=-1,
                        pad_token_id=0)
    rng = np.random.default_rng(11)
    n_req = 16
    budgets = [4, 8, 8, 16] * 4                    # ragged long tail
    prompts = [list(rng.integers(2, 500, rng.integers(4, 24)))
               for _ in range(n_req)]
    request = RolloutRequest(
        prompt_ids=[[int(t) for t in p] for p in prompts],
        answers=[""] * n_req, max_new_tokens=budgets,
    )

    outs = {}
    layouts = []
    for mega in (False, "auto"):
        eng = ContinuousBatchingEngine(
            cfg, sp, num_slots=16, max_seq_len=128, prompt_bucket=32,
            decode_chunk=4, weight_quant="int8", kv_quant="int8",
            decode_attn_impl="pallas", use_mega=mega, mega_chunk_width=256,
            mega_threshold=8,
        )
        if mega == "auto":
            orig = eng.decode_and_harvest

            def spy(pool, dp, r, _o=orig):
                layouts.append(
                    ContinuousBatchingEngine._is_stacked(pool.kv_layers))
                return _o(pool, dp, r)

            eng.decode_and_harvest = spy
        outs[mega] = eng.rollout(params, request, jax.random.PRNGKey(9))

    assert False in layouts and True in layouts, (
        f"hybrid never switched to the megakernel on-chip: {layouts}")
    a, b = outs[False], outs["auto"]
    np.testing.assert_array_equal(
        np.asarray(a.response_lengths), np.asarray(b.response_lengths))
    agree = float(
        (np.asarray(a.response_ids) == np.asarray(b.response_ids))[
            np.asarray(a.response_mask)].mean())
    assert agree > 0.9, f"hybrid engine greedy agreement {agree}"
    return {"greedy_agree": agree,
            "layouts_seen": sorted({bool(x) for x in layouts}, key=int)}


def check_q8_decode_kernel() -> dict:
    from rlinf_tpu.ops.pallas.decode_attention import (
        decode_attention_packed_q8,
        decode_attention_packed_q8_xla,
        quantize_kv_token,
    )

    B, S, H, Kv, Hd = 32, 512, 14, 2, 64
    KD = Kv * Hd
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, Hd), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, KD), jnp.float32) * 0.3
    v = jax.random.normal(ks[2], (B, S, KD), jnp.float32) * 0.3
    kq, kscale = quantize_kv_token(k)
    vq, vscale = quantize_kv_token(v)
    starts = jnp.zeros((B,), jnp.int32)
    lengths = (jnp.arange(B, dtype=jnp.int32) % (S - 8)) + 5
    pf = jax.jit(functools.partial(decode_attention_packed_q8, num_kv=Kv,
                                   block_size=512))
    xf = jax.jit(functools.partial(decode_attention_packed_q8_xla, num_kv=Kv))
    a = np.asarray(jax.device_get(
        pf(q, kq, vq, kscale, vscale, starts, lengths)), np.float32)
    b = np.asarray(jax.device_get(
        xf(q, kq, vq, kscale, vscale, starts, lengths)), np.float32)
    err = float(np.abs(a - b).max())
    assert err < 0.01, f"q8 decode kernel parity FAILED on-chip: {err:.5f}"
    return {"max_err": err}


def check_q8_generate() -> dict:
    """Full static generate on an int8 KV cache (pallas) vs the bf16-cache
    XLA path: greedy tokens must match, behavior logprobs must stay close
    (the serving configuration bench measures when kv_quant=int8)."""
    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params,
    )

    cfg = LLMConfig(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=512, max_seq_len=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    B, P, N = 8, 64, 16
    r = np.random.default_rng(5)
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), bool)
    sp = SamplingParams(max_new_tokens=N, greedy=True, eos_token_id=-1)

    def run(kv_quant, impl):
        out = jax.jit(lambda p, rg, i, m: generate(
            p, cfg, rg, i, m, sp, decode_attn_impl=impl,
            kv_quant=kv_quant))(params, jax.random.PRNGKey(1), ids, mask)
        return (np.asarray(out.response_ids),
                np.asarray(out.response_logprobs, np.float32))

    toks_ref, lp_ref = run("none", "xla")
    toks_q8, lp_q8 = run("int8", "pallas")
    agree = float((toks_ref == toks_q8).mean())
    lp_err = float(np.abs(lp_ref - lp_q8).max())
    assert agree > 0.95, f"q8 generate greedy divergence: agree={agree}"
    assert lp_err < 0.15, f"q8 generate logprob err {lp_err}"
    return {"greedy_agree": agree, "lp_max_err": lp_err}


def check_fused_ce() -> dict:
    """Fused linear-CE Pallas kernel (fwd + custom-vjp bwd) vs the chunked
    XLA path, jitted on-chip at real vocab size (the 0.5B lm-head geometry,
    tied-embedding [V, D] layout — the bench train step's configuration)."""
    from rlinf_tpu.ops.logprobs import fused_linear_logprobs_and_entropy
    from rlinf_tpu.ops.pallas.linear_ce import fused_linear_ce

    B, S, D, V = 4, 256, 896, 151936
    r = np.random.default_rng(3)
    h = jnp.asarray(r.normal(size=(B, S, D)) * 0.5, jnp.bfloat16)
    emb = jnp.asarray(r.normal(size=(V, D)) * 0.02, jnp.bfloat16)
    tgt = jnp.asarray(r.integers(0, V, (B, S)), jnp.int32)
    adv = jnp.asarray(r.normal(size=(B, S)), jnp.float32)

    def loss_pallas(h, emb):
        lp, ent = fused_linear_ce(h, emb, tgt, w_layout="vd")
        return jnp.mean(lp * adv) + 0.01 * jnp.mean(ent), (lp, ent)

    def loss_xla(h, emb):
        lp, ent = fused_linear_logprobs_and_entropy(h, emb.T, tgt)
        return jnp.mean(lp * adv) + 0.01 * jnp.mean(ent), (lp, ent)

    gp = jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1), has_aux=True))
    gx = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1), has_aux=True))
    (lv_p, (lp_p, ent_p)), (dh_p, dw_p) = jax.device_get(gp(h, emb))
    (lv_x, (lp_x, ent_x)), (dh_x, dw_x) = jax.device_get(gx(h, emb))

    lp_err = float(np.abs(np.asarray(lp_p) - np.asarray(lp_x)).max())
    ent_err = float(np.abs(np.asarray(ent_p) - np.asarray(ent_x)).max())
    dh_p32, dh_x32 = np.asarray(dh_p, np.float32), np.asarray(dh_x, np.float32)
    dw_p32, dw_x32 = np.asarray(dw_p, np.float32), np.asarray(dw_x, np.float32)
    dh_rel = float(
        np.linalg.norm(dh_p32 - dh_x32) / max(np.linalg.norm(dh_x32), 1e-9))
    dw_rel = float(
        np.linalg.norm(dw_p32 - dw_x32) / max(np.linalg.norm(dw_x32), 1e-9))
    assert lp_err < 5e-3 and ent_err < 5e-3, (
        f"fused CE forward parity FAILED: lp_err {lp_err:.5f} "
        f"ent_err {ent_err:.5f}")
    assert dh_rel < 0.05 and dw_rel < 0.05, (
        f"fused CE grad parity FAILED: dh_rel {dh_rel:.4f} dw_rel {dw_rel:.4f}")
    return {"lp_err": lp_err, "ent_err": ent_err, "dh_rel": dh_rel,
            "dw_rel": dw_rel}


def check_fused_sampler() -> dict:
    """Fused lm-head sampling kernel at real vocab: greedy tokens must match
    the XLA argmax oracle; sampled-mode logprobs must equal the temperature
    softmax logprob of whatever token the kernel drew."""
    from rlinf_tpu.models.llm.quant import quantize_tensor
    from rlinf_tpu.ops.pallas.sampler_kernel import fused_lmhead_sample

    B, D, V = 64, 896, 151936
    r = np.random.default_rng(11)
    h = jnp.asarray(r.normal(size=(B, D)) * 0.4, jnp.bfloat16)
    w = jnp.asarray(r.normal(size=(D, V)) * 0.02, jnp.float32)
    q = quantize_tensor(w)

    logits = np.asarray(jax.device_get(jax.jit(
        lambda h, qq, qs: (h.astype(jnp.float32) @ qq.astype(jnp.float32))
        * qs.reshape(1, -1)
    )(h, q.q, q.scale)), np.float32)

    tok_g, lp_g = jax.device_get(jax.jit(functools.partial(
        fused_lmhead_sample, greedy=True))(h, q.q, q.scale, jnp.int32(3)))
    tok_ref = logits.argmax(-1)
    agree = float((np.asarray(tok_g) == tok_ref).mean())
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) \
        + logits.max(-1)
    lp_ref = logits[np.arange(B), tok_ref] - lse
    g_err = float(np.abs(np.asarray(lp_g) - lp_ref).max())

    T = 0.9
    tok_s, lp_s = jax.device_get(jax.jit(functools.partial(
        fused_lmhead_sample, temperature=T))(h, q.q, q.scale, jnp.int32(77)))
    scaled = logits / T
    lse_s = np.log(np.exp(scaled - scaled.max(-1, keepdims=True)).sum(-1)) \
        + scaled.max(-1)
    lp_s_ref = scaled[np.arange(B), np.asarray(tok_s)] - lse_s
    s_err = float(np.abs(np.asarray(lp_s) - lp_s_ref).max())

    assert agree > 0.98, f"fused sampler greedy disagree: {agree}"
    assert g_err < 5e-3 and s_err < 5e-3, (
        f"fused sampler logprob err: greedy {g_err:.5f} sampled {s_err:.5f}")
    return {"greedy_agree": agree, "lp_err": max(g_err, s_err)}


def check_megakernel_generate() -> dict:
    """Whole-decode-step megakernel (ops/pallas/decode_megakernel.py) inside
    the full jitted generate loop vs the per-layer q8 pallas path: greedy
    tokens must match and behavior logprobs must agree — the exact serving
    configuration bench.py measures when mega weights are passed."""
    from rlinf_tpu.models.llm import (
        LLMConfig, SamplingParams, generate, init_params, quantize_params,
    )
    from rlinf_tpu.ops.pallas.decode_megakernel import pack_decode_weights

    cfg = LLMConfig(
        vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, intermediate_size=512, max_seq_len=256,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params)
    plan, mw = pack_decode_weights(qparams, cfg, chunk_width=256)
    B, P, N = 8, 64, 16
    r = np.random.default_rng(5)
    ids = jnp.asarray(r.integers(0, cfg.vocab_size, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), bool)
    sp = SamplingParams(max_new_tokens=N, greedy=True, eos_token_id=-1)

    def run(mega):
        out = jax.jit(lambda p, qp, mw, rg, i, m: generate(
            p, cfg, rg, i, m, sp, decode_params=qp,
            decode_attn_impl="pallas", kv_quant="int8",
            mega=(plan, mw) if mega else None, sampler_impl="xla",
        ))(params, qparams, mw, jax.random.PRNGKey(1), ids, mask)
        return (np.asarray(out.response_ids),
                np.asarray(out.response_logprobs, np.float32))

    toks_ref, lp_ref = run(mega=False)
    toks_mega, lp_mega = run(mega=True)
    agree = float((toks_ref == toks_mega).mean())
    # logprob parity is only meaningful BEFORE a (legitimate, near-tie)
    # greedy token flip: once one row picks a different argmax the
    # sequences fork and later logprobs compare different texts.
    err = np.abs(lp_ref - lp_mega)
    same = toks_ref == toks_mega
    prefix = np.cumprod(same, axis=1).astype(bool)
    lp_err = float(err[prefix].max()) if prefix.any() else 0.0
    assert agree > 0.95, f"megakernel generate greedy divergence: {agree}"
    assert lp_err < 0.05, (
        f"megakernel generate pre-divergence logprob err {lp_err}")
    return {"greedy_agree": agree, "lp_max_err_predivergence": lp_err}


def check_moe_layer() -> dict:
    """MoE expert dispatch on the real chip: the dropless ``ragged_dot``
    path and the GShard capacity-einsum path vs a dense all-experts oracle
    (every expert computed for every token, combined with the same top-k
    router weights). Run in f32 so the oracle comparison is tight; a bf16
    dropless-vs-capacity row covers the production dtype."""
    from rlinf_tpu.ops.moe import (
        MoEConfig, init_moe_params, moe_layer_capacity, moe_layer_dropless,
    )

    B, S, D, E, F, K = 4, 128, 256, 16, 256, 2
    moe = MoEConfig(num_experts=E, num_experts_per_token=K,
                    capacity_factor=8.0)  # drop-free
    params = init_moe_params(jax.random.PRNGKey(0), D, F, moe, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.float32) * 0.5

    def oracle(params, x):
        from rlinf_tpu.ops.moe import _route

        N = B * S
        tokens = x.reshape(N, D)
        _, topk_probs, topk_idx = _route(params, tokens, moe)
        # all experts, all tokens: [E, N, F] -> [E, N, D]
        g = jnp.einsum("nd,edf->enf", tokens, params["gate"])
        u = jnp.einsum("nd,edf->enf", tokens, params["up"])
        y = jnp.einsum("enf,efd->end", jax.nn.silu(g) * u, params["down"])
        w = jnp.zeros((N, E), jnp.float32)
        w = w.at[jnp.arange(N)[:, None], topk_idx].add(topk_probs)
        return jnp.einsum("ne,end->nd", w, y).reshape(B, S, D)

    # pin true-f32 matmuls for the oracle comparison: TPU default precision
    # runs f32 dots as bf16 passes (~1e-3 rel), which is not what this
    # check is hunting for
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(
            jax.device_get(jax.jit(oracle)(params, x)), np.float32)
        outs = {}
        for name, fn in (("dropless", moe_layer_dropless),
                         ("capacity", moe_layer_capacity)):
            got = jax.jit(lambda p, x, fn=fn: fn(p, x, moe)[0])(params, x)
            got = np.asarray(jax.device_get(got), np.float32)
            rel = float(
                np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9))
            outs[f"{name}_rel"] = rel
            assert rel < 1e-3, f"moe {name} vs dense oracle rel err {rel}"

    # production dtype: dropless vs capacity must agree in bf16 too
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)
    a = np.asarray(jax.device_get(
        jax.jit(lambda p, x: moe_layer_dropless(p, x, moe)[0])(pb, xb)
    ), np.float32)
    b = np.asarray(jax.device_get(
        jax.jit(lambda p, x: moe_layer_capacity(p, x, moe)[0])(pb, xb)
    ), np.float32)
    rel_bf16 = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))
    assert rel_bf16 < 3e-2, f"moe dropless vs capacity bf16 rel {rel_bf16}"
    outs["dropless_vs_capacity_bf16_rel"] = rel_bf16
    return outs


CHECKS = [
    ("decode_kernel", check_decode_kernel),
    ("megakernel_generate", check_megakernel_generate),
    ("moe_layer", check_moe_layer),
    ("fused_ce", check_fused_ce),
    ("fused_sampler", check_fused_sampler),
    ("q8_decode_kernel", check_q8_decode_kernel),
    ("q8_generate", check_q8_generate),
    ("decode_in_model", check_decode_in_model),
    ("flash_train_step", check_flash_train_step),
    ("paged_kernel", check_paged_kernel),
    ("static_engine", check_static_engine),
    ("continuous_engine", check_continuous_engine),
    ("mega_engine", check_mega_engine),
]


def run_all(checks=None) -> dict:
    """Run the named checks (all by default) on the current backend.

    Returns {name: {"ok": bool, ...detail}}; raises nothing — callers decide
    how to fail. bench.py treats any not-ok as a refusal to report perf."""
    results = {}
    for name, fn in CHECKS:
        if checks is not None and name not in checks:
            continue
        try:
            detail = fn()
            results[name] = {"ok": True, **detail}
        except AssertionError as e:
            results[name] = {"ok": False, "error": str(e)}
        except Exception as e:  # infra errors are failures too
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    return results


# ---------------------------------------------------------------------------
# pytest wrappers (self-skip off-TPU; the suite conftest forces CPU)
# ---------------------------------------------------------------------------

needs_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="on-chip parity gates require a real TPU backend"
)


@needs_tpu
@pytest.mark.parametrize("name,fn", CHECKS, ids=[n for n, _ in CHECKS])
def test_onchip(name, fn):
    fn()


if __name__ == "__main__":
    assert _on_tpu(), (
        f"backend is {jax.default_backend()!r} — run on a TPU host"
    )
    results = run_all(
        checks=set(sys.argv[1:]) if len(sys.argv) > 1 else None
    )
    print(json.dumps(results, indent=1))
    sys.exit(0 if all(r["ok"] for r in results.values()) else 1)
