"""TrainState: params + optimizer state as a sharded pytree.

The optimizer runs in float32 master precision with bf16 compute params — the
TPU analog of Megatron's distributed optimizer with fp32 main params
(reference rlinf/hybrid_engines/megatron/megatron_model_manager.py:753).
Optimizer state inherits each parameter's sharding (ZeRO-like when params use
the fsdp axis) automatically from pjit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from rlinf_tpu.parallel.sharding import (
    match_partition_rules,
    tree_shardings,
)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors the reference's optimizer YAML block (lr, betas, wd, clip,
    warmup — e.g. examples/reasoning/config/*.yaml optim sections)."""

    lr: float = 1e-6
    min_lr: float = 0.0
    weight_decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.95
    eps: float = 1e-8
    clip_grad: float = 1.0
    warmup_steps: int = 0
    total_steps: int = 0  # 0 => constant after warmup
    schedule: str = "constant"  # constant | cosine
    #: adamw | adafactor. Adafactor's factored second moment is the
    #: single-chip analog of Megatron's distributed optimizer: a 1.5B model
    #: OOMs 16GB HBM with f32 Adam moments (12GB) but fits with adafactor
    #: (second moment ~ O(rows+cols)).
    name: str = "adamw"
    #: adamw first-moment dtype ("float32" | "bfloat16"): bf16 halves the
    #: m-buffer at negligible quality cost (the v buffer stays f32)
    moment_dtype: str = "float32"
    #: keep an f32 MASTER copy of the params in the optimizer state and
    #: derive each step's update from it. Required for serious bf16-param
    #: training: a bf16 parameter near 0.02 has ~7.8e-5 ulp, so adamw-scale
    #: updates (~lr) round to ZERO in the plain path and training silently
    #: stalls. The reference gets this from Megatron's fp32 main params /
    #: torch AMP master weights.
    master_weights: bool = False


def make_schedule(cfg: OptimizerConfig):
    if cfg.schedule == "cosine" and cfg.total_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=cfg.min_lr,
        )
    if cfg.warmup_steps > 0:
        return optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return cfg.lr


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    import jax.numpy as jnp

    if cfg.name == "adafactor":
        inner = optax.adafactor(
            learning_rate=make_schedule(cfg),
            decay_rate=cfg.beta2,
            weight_decay_rate=(
                cfg.weight_decay if cfg.weight_decay > 0 else None
            ),
        )
    elif cfg.name == "adamw":
        inner = optax.adamw(
            learning_rate=make_schedule(cfg),
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mu_dtype=(
                jnp.bfloat16 if cfg.moment_dtype == "bfloat16" else None
            ),
        )
    else:
        raise ValueError(
            f"optimizer.name must be adamw|adafactor, got {cfg.name!r}"
        )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad) if cfg.clip_grad > 0 else optax.identity(),
        inner,
    )
    if cfg.master_weights:
        tx = with_master_weights(tx)
    return tx


def with_master_weights(inner: optax.GradientTransformation):
    """Wrap a transformation with an f32 master copy of the params.

    The inner optimizer runs entirely in f32 against the master; the emitted
    update is ``new_master - params`` in f32, so the caller's standard apply
    ``(p.f32 + u).astype(p.dtype)`` lands exactly on the rounded master.
    Sub-ulp updates accumulate in the master instead of vanishing in bf16.
    """
    import jax

    def init(params):
        master = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), params)
        return {"inner": inner.init(master), "master": master}

    def update(grads, state, params=None):
        grads32 = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
        updates32, inner_state = inner.update(
            grads32, state["inner"], state["master"])
        new_master = jax.tree_util.tree_map(
            lambda m, u: m + u, state["master"], updates32)
        emitted = jax.tree_util.tree_map(
            lambda m, p: m - p.astype(jnp.float32), new_master, params)
        return emitted, {"inner": inner_state, "master": new_master}

    return optax.GradientTransformation(init, update)


def create_train_state(
    init_params_fn: Callable[[jax.Array], Any],
    tx: optax.GradientTransformation,
    rng: jax.Array,
    mesh: Optional[Mesh] = None,
    partition_rules=None,
) -> TrainState:
    """Initialize params (+opt state) directly sharded on the mesh.

    With a mesh: runs init under jit with out_shardings from the rule table so
    large models materialize sharded, never replicated on one host.
    """
    if mesh is None:
        params = init_params_fn(rng)
        return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))

    shapes = jax.eval_shape(init_params_fn, rng)
    specs = match_partition_rules(partition_rules, shapes)
    shardings = tree_shardings(shapes, specs, mesh)

    with jax.set_mesh(mesh):
        params = jax.jit(init_params_fn, out_shardings=shardings)(rng)
        opt_shapes = jax.eval_shape(tx.init, shapes)
        opt_specs = _opt_state_specs(opt_shapes, shapes, specs)
        opt_shardings = tree_shardings(opt_shapes, opt_specs, mesh)
        opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(params)
        # The step scalar must live on the SAME global device set as the
        # params: an uncommitted single-device scalar cannot be mixed with
        # multi-process global arrays in one jitted call.
        step = jax.device_put(
            jnp.zeros((), jnp.int32),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
    return TrainState(step, params, opt_state)


def _opt_state_specs(opt_shapes, param_shapes, param_specs):
    """Give optimizer-state leaves that mirror a parameter its sharding;
    everything else (counts, schedules) replicated."""
    from jax.sharding import PartitionSpec as P

    flat_params = {
        s.shape: spec
        for s, spec in zip(
            jax.tree_util.tree_leaves(param_shapes),
            jax.tree_util.tree_leaves(
                param_specs, is_leaf=lambda x: isinstance(x, P)
            ),
        )
    }

    def spec_for(leaf):
        if hasattr(leaf, "shape") and leaf.shape in flat_params:
            return flat_params[leaf.shape]
        return P()

    return jax.tree_util.tree_map(spec_for, opt_shapes)


def rescale_train_state(
    state: TrainState, new_mesh: Mesh, partition_rules
) -> TrainState:
    """Re-shard a live TrainState (params + optimizer) onto a new mesh under
    the same rule table — the online parallel-strategy switch
    (reference MegatronWorker.apply_parallel_strategy megatron_worker.py:1046
    / dynamic-scheduler ActorManager rescale). One resharding device_put per
    pytree; XLA moves only shards whose owner changes."""
    from rlinf_tpu.parallel.sharding import match_partition_rules, tree_shardings

    specs = match_partition_rules(partition_rules, state.params)
    shardings = tree_shardings(state.params, specs, new_mesh)
    params = jax.device_put(state.params, shardings)
    opt_specs = _opt_state_specs(state.opt_state, state.params, specs)
    opt_shardings = tree_shardings(state.opt_state, opt_specs, new_mesh)
    opt_state = jax.device_put(state.opt_state, opt_shardings)
    from jax.sharding import NamedSharding, PartitionSpec

    step = jax.device_put(state.step, NamedSharding(new_mesh, PartitionSpec()))
    return TrainState(step, params, opt_state)
