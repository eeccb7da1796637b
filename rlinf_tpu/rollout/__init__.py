"""On-device autoregressive rollout engines (replace SGLang/vLLM embedding).

Engine selection mirrors the reference's rollout.backend choice
(reference rlinf/config.py:464 sglang|vllm|hf): static batch generation,
continuous slot-pool batching, or paged-KV continuous batching — all pure
JAX programs on the mesh instead of embedded CUDA serving engines.
"""

from rlinf_tpu.rollout.engine import RolloutEngine

__all__ = [
    "RolloutEngine",
    "build_rollout_engine",
    "resolve_rollout_paths",
    "resolve_recompute_logprobs",
]


def resolve_rollout_paths(cfg, mesh=None):
    """Resolve the ``auto`` knobs: -> (engine, weight_quant, decode_attn)."""
    import jax

    ro = cfg.rollout
    on_tpu = jax.default_backend() == "tpu"
    engine = ro.engine
    if engine == "auto":
        engine = "static" if mesh is not None else "continuous"
    quant = ro.weight_quant
    if quant == "auto":
        quant = "int8" if on_tpu else "none"
    decode_attn = ro.decode_attn_impl or ("pallas" if on_tpu else "xla")
    return engine, quant, decode_attn


def resolve_recompute_logprobs(cfg, mesh=None) -> bool:
    """The rollout/training logprob-consistency invariant.

    ``algorithm.recompute_logprobs=None`` (the default) resolves to True
    whenever the rollout decode path is a *different computation* from the
    training path — int8-quantized decode weights or the pallas decode
    kernel — so engine-reported behavior logprobs are never silently fed
    into a plain PPO ratio as if on-policy (reference semantics: behavior
    vs proximal separation, rlinf/algorithms/losses.py:27; the reference
    runner's run_inference recompute phase, runners/reasoning_runner.py:1173).
    """
    explicit = cfg.algorithm.recompute_logprobs
    if explicit is not None:
        return bool(explicit)
    _, quant, decode_attn = resolve_rollout_paths(cfg, mesh=mesh)
    return (
        quant != "none"
        or cfg.rollout.kv_quant != "none"
        or decode_attn != cfg.attn_impl
    )


def build_rollout_engine(cfg, mesh=None):
    """Build the rollout engine selected by ``cfg.rollout`` (TrainerConfig).

    "auto" resolves to static under a mesh (the slot pool is single-program;
    sharded DP rollout wants the static batched path) and continuous
    otherwise. "auto" weight_quant resolves to int8 on TPU.
    """
    import jax

    ro = cfg.rollout
    on_tpu = jax.default_backend() == "tpu"
    engine = ro.engine
    if engine == "auto":
        engine = "static" if mesh is not None else "continuous"
    quant = ro.weight_quant
    if quant == "auto":
        quant = "int8" if on_tpu else "none"

    if engine == "static":
        return RolloutEngine(
            cfg.model, cfg.sampling,
            prompt_bucket=ro.prompt_bucket,
            attn_impl=cfg.attn_impl,
            decode_attn_impl=ro.decode_attn_impl,
            weight_quant=quant,
        )
    if engine == "continuous":
        from rlinf_tpu.rollout.continuous_engine import (
            ContinuousBatchingEngine,
        )

        return ContinuousBatchingEngine(
            cfg.model, cfg.sampling,
            num_slots=ro.num_slots,
            max_seq_len=min(
                cfg.model.max_seq_len,
                cfg.data.max_prompt_len + cfg.sampling.max_new_tokens,
            ),
            prompt_bucket=ro.prompt_bucket,
            decode_chunk=ro.decode_chunk,
            weight_quant=quant,
            kv_quant=ro.kv_quant,
            decode_attn_impl=ro.decode_attn_impl,
            attn_impl=cfg.attn_impl,
        )
    if engine == "paged":
        from rlinf_tpu.rollout.paged_engine import PagedContinuousEngine

        return PagedContinuousEngine(
            cfg.model, cfg.sampling,
            num_slots=ro.num_slots,
            max_seq_len=min(
                cfg.model.max_seq_len,
                cfg.data.max_prompt_len + cfg.sampling.max_new_tokens,
            ),
            prompt_bucket=ro.prompt_bucket,
            decode_chunk=ro.decode_chunk,
            page_size=ro.page_size,
            attn_impl=(
                ro.decode_attn_impl
                or ("pallas" if on_tpu else "xla")
            ),
        )
    raise ValueError(f"unknown rollout engine {engine!r}")
