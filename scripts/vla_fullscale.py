"""Full-geometry VLA on-chip fit + latency proof (VERDICT r3 item 4).

pi0 at published scale — PaliGemma prefix (Gemma-2B trunk + SigLIP
So400m-class ViT) + 300M action expert (1024/4096), 50-step action chunks
at action_dim 32, 10 flow steps — random weights on ONE v5e:
  * prefill + flow-SDE denoise rollout latency (predict_action_batch),
  * one PPO update step with adafactor (the memory-feasible optimizer at
    3B+ on a 16GB chip).
OpenVLA at 7B geometry (Qwen2-7B-class trunk standing in for Llama-2-7B +
prismatic dual-ViT): greedy 7-token action decode latency, int8
weight-only trunk (bf16 7B weights alone are 14GB — quantized serving is
the production path, models/llm/quant.py).

Writes one JSON line per measurement; the final line is the summary for
logs/vla_fullscale.json.

Reference geometries: rlinf/models/embodiment/openpi/ (pi0),
openvla/ + prismatic/ (7B).
"""

import functools
import json
import time

import numpy as np


def sync(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf).astype(jnp.float32)[0]))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def _build_pi0():
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.embodiment.openpi import Pi0Config, Pi0Policy
    from rlinf_tpu.models.embodiment.vit import ViTConfig
    from rlinf_tpu.models.llm.config import LLMConfig

    # PaliGemma's Gemma-2B trunk geometry (18 layers, d=2048, head_dim 256,
    # ffn 16384, 256k vocab).
    gemma_2b = LLMConfig(
        vocab_size=257152, hidden_size=2048, intermediate_size=16384,
        num_layers=18, num_heads=8, num_kv_heads=1, head_dim=256,
        rope_theta=1e4, tie_word_embeddings=True, qkv_bias=False,
        max_seq_len=1024, dtype="bfloat16",
    )
    # SigLIP So400m-class ViT: 27 layers, d=1152, patch 14 @ 224.
    vit = ViTConfig(image_size=224, patch_size=14, hidden=1152, layers=27,
                    heads=16)
    policy = Pi0Policy(
        Pi0Config.pi0_full(), vlm_cfg=gemma_2b, vit_cfg=vit, remat=True,
        unroll_layers=True,
    )
    rng = jax.random.PRNGKey(0)
    params = policy.init(rng)
    # cast the f32-initialized expert/heads to bf16: the published model
    # serves bf16 end-to-end and it halves optimizer+grad traffic
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    return policy, params


def _pi0_obs(policy, B):
    import jax.numpy as jnp

    c = policy.cfg
    return {
        c.image_key: jnp.zeros((B, 224, 224, 3), jnp.bfloat16),
        c.text_key: jnp.zeros((B, 32), jnp.int32),
        c.text_mask_key: jnp.ones((B, 32), bool),
        c.state_key: jnp.zeros((B, c.state_dim), jnp.float32),
    }


def run_pi0_rollout():
    """Full-geometry pi0 prefill + flow-SDE rollout latency (B=8)."""
    import jax

    policy, params = _build_pi0()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    emit(model="pi0_full", n_params_b=round(n_params / 1e9, 3),
         param_gb=round(tree_bytes(params) / 2**30, 2))

    B = 8   # envs per chip (reference embodied configs run 8-16 per GPU)
    rng = jax.random.PRNGKey(0)
    obs = _pi0_obs(policy, B)
    predict = jax.jit(
        lambda p, r, o: policy.predict_action_batch(p, r, o)
    )
    t0 = time.perf_counter()
    out = predict(params, rng, obs)
    sync(out.actions)
    emit(model="pi0_full", phase="rollout_compile",
         seconds=round(time.perf_counter() - t0, 1))
    for _ in range(2):
        out = predict(params, rng, obs)
    sync(out.actions)
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        out = predict(params, rng, obs)
    sync(out.actions)
    rollout_ms = (time.perf_counter() - t0) / iters * 1e3
    emit(model="pi0_full", phase="rollout", batch=B,
         ms_per_chunk=round(rollout_ms, 1),
         ms_per_env_step=round(rollout_ms / B, 2))
    return {
        "pi0_params_b": round(n_params / 1e9, 3),
        "pi0_rollout_ms_per_chunk_b8": round(rollout_ms, 1),
        "pi0_rollout_fit": True,
    }


def run_pi0_train():
    """Full-geometry pi0 PPO update with adafactor (fresh process: the
    rollout executable's allocator residue otherwise tips the backward over
    HBM). Behavior chain/logprobs are one on-policy forward at the train
    microbatch size."""
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.training.train_state import (
        OptimizerConfig, make_optimizer,
    )

    policy, params = _build_pi0()

    # one PPO update step (flow-chain logprobs vs behavior, adafactor).
    # No clip_by_global_norm: the global norm pins the ENTIRE 6GB grads
    # tree live simultaneously with params + updates (measured 18.6GB >
    # 15.75GB HBM); adafactor's built-in per-update clipping
    # (clipping_threshold=1.0) provides the stability role at this scale.
    tx = make_optimizer(OptimizerConfig(lr=1e-6, name="adafactor",
                                        clip_grad=0.0))
    # PPO microbatch of 4: B=8 activations leave the bwd pass ~1GB over
    # HBM even with remat + split grad/apply (measured 16.76/15.75G);
    # per-chip microbatching with grad accumulation is the production
    # path at this scale anyway (training/learner.py scan microbatches).
    Bt = 2
    obs_t = _pi0_obs(policy, Bt)
    c = policy.cfg
    rng = jax.random.PRNGKey(1)
    sde = jax.jit(lambda p, r, o: policy.predict_action_batch(p, r, o))(
        params, rng, obs_t)
    actions = sde.actions
    old_lp = sde.logprobs
    sync(actions)
    adv = jnp.ones((Bt,), jnp.float32)
    del sde
    import gc

    gc.collect()
    jax.clear_caches()
    emit(model="pi0_train", phase="behavior_forward_done")

    # Two-pass parameter-group backward (grads wrt the 2B trunk, then wrt
    # ViT+expert+heads with the trunk frozen): one full backward's
    # args+grads+workspace is 18GB at this geometry even with per-layer
    # remat and unrolled scans (AOT memory_analysis), while each group pass
    # is ~14.3GB. Same gradients, two passes — the parameter-group
    # accumulation a pod would avoid by sharding.
    def group_loss(live, frozen, o, a, l, ad):
        p = {**live, **jax.lax.stop_gradient(frozen)}
        fwd = policy.default_forward(p, o, a)
        lp = fwd["logprobs"]
        ratio = jnp.exp(jnp.sum(lp - l, axis=-1).clip(-10, 10))
        return -jnp.mean(jnp.minimum(ratio * ad, jnp.clip(ratio, 0.8, 1.2) * ad))

    grad_group = jax.jit(
        lambda live, frozen, o, a, l, ad:
        jax.value_and_grad(group_loss)(live, frozen, o, a, l, ad))

    # LEAF-WISE adafactor apply with per-leaf donation: one fused
    # params+grads+updates step needs three 6GB trees live (measured
    # 18.6GB; a split apply still OOMs at runtime — the axon backend
    # reports the whole-tree donation "not usable"). Applying per leaf
    # bounds the peak at params + grads + ONE leaf's temporaries, the
    # memory discipline a pod-scale trainer would get from sharded
    # optimizer states.
    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def leaf_apply(p, g, s):
        updates, new_s = tx.update(g, s, p)
        new_p = (p.astype(jnp.float32) + updates.astype(jnp.float32)
                 ).astype(p.dtype)
        return new_p, new_s

    # Leaves over ~256MB (stacked 18-layer trunk mats at 1.2GB, the 257k-row
    # embed at 1GB) additionally apply CHUNKED along the leading axis with
    # in-place write-back: their f32 adafactor temporaries alone spike ~4GB.
    # Per-layer factored stats for stacked weights are the standard (more
    # granular) adafactor treatment anyway.
    BIG = 256 * 2**20
    CHUNKS = 8

    def chunk_of(p, j, n):
        r = p.shape[0] // n
        return jax.lax.dynamic_slice_in_dim(p, j * r, r, 0)

    slice_j = jax.jit(chunk_of, static_argnums=(2,))
    write_j = jax.jit(
        lambda p, j, v, n: jax.lax.dynamic_update_slice_in_dim(
            p, v, j * (p.shape[0] // n), 0),
        static_argnums=(3,), donate_argnums=(0,))

    def n_chunks(p):
        if p.size * p.dtype.itemsize <= BIG:
            return 0
        if p.ndim >= 3 and p.shape[0] <= 64:
            return p.shape[0]             # stacked layers: chunk = layer
        assert p.shape[0] % CHUNKS == 0, p.shape
        return CHUNKS                     # embed: row bands

    groups = [("vlm",), tuple(k for k in params if k != "vlm")]
    chunk_spec = {
        k: [n_chunks(p) for p in jax.tree_util.tree_leaves(params[k])]
        for k in params
    }
    opt_states = {
        k: [
            [tx.init(slice_j(p, j, n)) for j in range(n)] if n
            else tx.init(p)
            for p, n in zip(
                jax.tree_util.tree_leaves(params[k]), chunk_spec[k])
        ]
        for k in params
    }

    def apply_group(key, grads):
        flat_p, tdef = jax.tree_util.tree_flatten(params[key])
        flat_g = jax.tree_util.tree_leaves(grads)
        flat_n = chunk_spec[key]
        flat_s = opt_states[key]
        for i in range(len(flat_p)):
            n = flat_n[i]
            if not n:
                flat_p[i], flat_s[i] = leaf_apply(
                    flat_p[i], flat_g[i], flat_s[i])
            else:
                for j in range(n):
                    new_sub, flat_s[i][j] = leaf_apply(
                        slice_j(flat_p[i], j, n),
                        slice_j(flat_g[i], j, n),
                        flat_s[i][j])
                    flat_p[i] = write_j(flat_p[i], j, new_sub, n)
            flat_g[i] = None
        params[key] = jax.tree_util.tree_unflatten(tdef, flat_p)

    def train_step(obs_mb, actions, old_lp, adv):
        loss = None
        for keys in groups:
            live = {k: params[k] for k in keys}
            frozen = {k: v for k, v in params.items() if k not in keys}
            loss, grads = grad_group(
                live, frozen, obs_mb, actions, old_lp, adv)
            del live, frozen
            # force the (deferred-execution) backward to run and free its
            # workspace before the optimizer sweep allocates
            sync(loss)
            for k in keys:
                apply_group(k, grads[k])
            del grads
        return loss

    t0 = time.perf_counter()
    loss = train_step(obs_t, actions, old_lp, adv)
    sync(params["expert"]["wq"])
    emit(model="pi0_full", phase="train_compile",
         seconds=round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        loss = train_step(obs_t, actions, old_lp, adv)
    sync(params["expert"]["wq"])
    train_ms = (time.perf_counter() - t0) / iters * 1e3
    emit(model="pi0_full", phase="ppo_update", batch=Bt,
         ms_per_step=round(train_ms, 1), loss=float(loss),
         optimizer="adafactor")
    return {
        "pi0_ppo_update_ms_b2": round(train_ms, 1),
        "pi0_train_fit": True,
    }


def run_openvla_7b():
    import jax
    import jax.numpy as jnp

    from rlinf_tpu.models.embodiment.openvla import (
        OpenVLAConfig, OpenVLAPolicy,
    )
    from rlinf_tpu.models.embodiment.vit import ViTConfig
    from rlinf_tpu.models.llm.config import LLMConfig
    from rlinf_tpu.models.llm.quant import quantize_params

    trunk = LLMConfig.qwen2_7b()
    vit = ViTConfig(image_size=224, patch_size=14, hidden=1024, layers=24,
                    heads=16)
    policy = OpenVLAPolicy(OpenVLAConfig(), vlm_cfg=trunk, vit_cfg=vit)
    rng = jax.random.PRNGKey(0)
    # Initialize + quantize the 7B trunk ON HOST: the bf16 tree (14.6GB)
    # and its int8 copy cannot both live in 16GB of HBM.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = policy.init(rng)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        # int8 weight-only trunk: quantized decode is the serving path
        # (unfused layout: the VLA decode goes through its own scan)
        params["vlm"] = quantize_params(params["vlm"], fuse=False)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    emit(model="openvla_7b", n_params_b=round(n_params / 1e9, 3),
         param_gb=round(tree_bytes(params) / 2**30, 2))

    B = 8
    c = policy.cfg
    obs = {
        c.image_key: jnp.zeros((B, 224, 224, 3), jnp.bfloat16),
        c.text_key: jnp.zeros((B, 32), jnp.int32),
        c.text_mask_key: jnp.ones((B, 32), bool),
    }
    predict = jax.jit(
        lambda p, r, o: policy.predict_action_batch(
            p, r, o, deterministic=True).actions
    )
    t0 = time.perf_counter()
    out = predict(params, rng, obs)
    sync(out)
    emit(model="openvla_7b", phase="decode_compile",
         seconds=round(time.perf_counter() - t0, 1))
    for _ in range(2):
        out = predict(params, rng, obs)
    sync(out)
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        out = predict(params, rng, obs)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    emit(model="openvla_7b", phase="action_decode", batch=B,
         ms_per_action=round(ms, 1), ms_per_env_step=round(ms / B, 2))
    return {
        "openvla_params_b": round(n_params / 1e9, 3),
        "openvla_decode_ms_b8": round(ms, 1),
        "openvla_fit": True,
    }


PHASES = {
    "pi0_rollout": run_pi0_rollout,
    "pi0_train": run_pi0_train,
    "openvla": run_openvla_7b,
}


def main():
    import sys

    if len(sys.argv) > 1:           # child mode: one phase, fresh process
        phase = sys.argv[1]
        try:
            out = PHASES[phase]()
        except Exception as e:  # noqa: BLE001
            emit(model=phase, error=str(e)[:400])
            out = {f"{phase}_fit": False, f"{phase}_error": str(e)[:200]}
        print("PHASE_RESULT " + json.dumps(out), flush=True)
        return

    # parent: each phase in its own process — HBM fragmentation from one
    # phase's executables must not tip the next phase's allocator
    import os
    import subprocess
    import sys as _sys

    summary = {}
    for phase in PHASES:
        proc = subprocess.run(
            [_sys.executable, os.path.abspath(__file__), phase],
            capture_output=True, text=True, timeout=2400,
        )
        _sys.stderr.write(proc.stderr[-2000:])
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
            if line.startswith("PHASE_RESULT "):
                summary.update(json.loads(line[len("PHASE_RESULT "):]))
    emit(summary=summary)
    with open("logs/vla_fullscale.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
