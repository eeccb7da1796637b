"""Mixture-of-Experts layer with expert parallelism.

TPU-native replacement for the reference's Megatron MoE stack (token
dispatcher + FUSCO fused all-to-all, reference
rlinf/hybrid_engines/megatron/token_dispatcher.py and
megatron_model_manager.py:247; EP sizing at utils/initialize.py:317).

Formulation: GShard/Switch einsum dispatch — top-k gating produces a one-hot
dispatch tensor [tokens, E, C] (C = capacity per expert); expert inputs are
gathered by a single MXU-friendly einsum, experts run as one batched matmul
over the E axis, and the combine einsum scatters results back weighted by
gate probabilities. With experts sharded over the ``expert`` mesh axis and
tokens over ``data``, XLA's SPMD partitioner inserts the all-to-alls the
reference implements by hand — no manual dispatch plumbing.

Load-balancing auxiliary loss follows Switch Transformer (mean gate fraction
x mean dispatch fraction x E).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

#: Test hook: None = auto (ragged collective off-CPU, emulation on CPU);
#: True/False pins the expert-parallel exchange branch.
FORCE_RAGGED: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    num_experts: int = 8
    num_experts_per_token: int = 2
    capacity_factor: float = 1.5
    aux_loss_coef: float = 0.01
    #: "capacity" = GShard einsum dispatch (drops at capacity; SPMD-sharded
    #: all-to-alls inserted by XLA when experts ride the ``expert`` axis).
    #: "dropless" = sort-based ragged dispatch + grouped GEMM
    #: (lax.ragged_dot) — zero token drops (MegaBlocks/FUSCO analog,
    #: reference rlinf/hybrid_engines/megatron/token_dispatcher.py).
    impl: str = "capacity"


def init_moe_params(
    rng: jax.Array,
    hidden: int,
    ffn: int,
    moe: MoEConfig,
    dtype,
) -> Dict[str, jax.Array]:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    E = moe.num_experts
    init = lambda key, shape: (
        jax.random.normal(key, shape, jnp.float32) * 0.02
    ).astype(dtype)
    return {
        "router": init(k1, (hidden, E)),
        "gate": init(k2, (E, hidden, ffn)),   # SwiGLU gate proj per expert
        "up": init(k3, (E, hidden, ffn)),
        "down": init(k4, (E, ffn, hidden)),
    }


def moe_layer(
    params: Dict[str, jax.Array],
    x: jax.Array,                 # [B, S, D]
    moe: MoEConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch on ``moe.impl``. Returns (output [B, S, D], aux_loss)."""
    if moe.impl == "dropless":
        out, aux, _ = moe_layer_dropless(params, x, moe)
        return out, aux
    return moe_layer_capacity(params, x, moe)


def moe_layer_capacity(
    params: Dict[str, jax.Array],
    x: jax.Array,                 # [B, S, D]
    moe: MoEConfig,
) -> Tuple[jax.Array, jax.Array]:
    """GShard capacity-einsum dispatch. Returns (output, aux_loss)."""
    B, S, D = x.shape
    E, C_k = moe.num_experts, moe.num_experts_per_token
    N = B * S
    tokens = x.reshape(N, D)

    # Router in fp32 for stable softmax.
    logits = jnp.einsum(
        "nd,de->ne", tokens.astype(jnp.float32),
        params["router"].astype(jnp.float32),
    )
    probs = jax.nn.softmax(logits, axis=-1)                     # [N, E]

    # top-k selection
    topk_probs, topk_idx = jax.lax.top_k(probs, C_k)            # [N, k]
    topk_probs = topk_probs / jnp.maximum(
        jnp.sum(topk_probs, axis=-1, keepdims=True), 1e-9
    )

    capacity = int(max(1, round(N * C_k / E * moe.capacity_factor)))

    # Build dispatch/combine tensors. For each of the k choices, tokens claim
    # a slot in their expert's capacity buffer by cumulative position; tokens
    # over capacity are dropped (residual passes through untouched).
    expert_onehot = jax.nn.one_hot(topk_idx, E, dtype=jnp.float32)  # [N,k,E]
    # priority: choice 0 of every token beats choice 1 (switch convention)
    flat = expert_onehot.transpose(1, 0, 2).reshape(C_k * N, E)     # [kN, E]
    position_in_expert = (jnp.cumsum(flat, axis=0) - flat) * flat   # [kN, E]
    in_capacity = position_in_expert < capacity
    flat = flat * in_capacity
    pos = jnp.sum(position_in_expert, axis=-1).astype(jnp.int32)    # [kN]
    slot_onehot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # [kN, C]
    dispatch_flat = flat[:, :, None] * slot_onehot[:, None, :]      # [kN,E,C]
    dispatch = dispatch_flat.reshape(C_k, N, E, capacity)
    gates = topk_probs.T[:, :, None, None] * dispatch               # [k,N,E,C]
    dispatch_mask = jnp.sum(dispatch, axis=0)                       # [N, E, C]
    combine = jnp.sum(gates, axis=0)                                # [N, E, C]

    # Gather expert inputs: one big einsum (all-to-all under SPMD).
    expert_in = jnp.einsum(
        "nec,nd->ecd", dispatch_mask.astype(x.dtype), tokens
    )  # [E, C, D]

    # Batched SwiGLU experts.
    h_gate = jnp.einsum("ecd,edf->ecf", expert_in, params["gate"])
    h_up = jnp.einsum("ecd,edf->ecf", expert_in, params["up"])
    h = jax.nn.silu(h_gate) * h_up
    expert_out = jnp.einsum("ecf,efd->ecd", h, params["down"])  # [E, C, D]

    out = jnp.einsum(
        "nec,ecd->nd", combine.astype(x.dtype), expert_out
    ).reshape(B, S, D)

    # Switch aux loss: E * mean_e(fraction routed) * mean_e(gate prob)
    me = jnp.mean(probs, axis=0)                                   # [N,E]->[E]
    ce = jnp.mean(
        jnp.sum(dispatch_mask, axis=-1).astype(jnp.float32), axis=0
    ) / C_k
    aux_loss = moe.aux_loss_coef * E * jnp.sum(me * ce)
    return out, aux_loss

# ---------------------------------------------------------------------------
# Dropless path: sort-based ragged dispatch + grouped GEMM
# ---------------------------------------------------------------------------

def _route(params: Dict[str, jax.Array], tokens: jax.Array, moe: MoEConfig):
    """fp32 router softmax + normalized top-k. tokens [N, D]."""
    logits = jnp.einsum(
        "nd,de->ne", tokens.astype(jnp.float32),
        params["router"].astype(jnp.float32),
    )
    probs = jax.nn.softmax(logits, axis=-1)                     # [N, E]
    topk_probs, topk_idx = jax.lax.top_k(probs, moe.num_experts_per_token)
    topk_probs = topk_probs / jnp.maximum(
        jnp.sum(topk_probs, axis=-1, keepdims=True), 1e-9
    )
    return probs, topk_probs, topk_idx


def moe_layer_dropless(
    params: Dict[str, jax.Array],
    x: jax.Array,                 # [B, S, D]
    moe: MoEConfig,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Zero-drop MoE: stable-sort (token, choice) pairs by expert, run the
    experts as grouped GEMMs over the contiguous groups (``lax.ragged_dot``
    keeps the MXU busy with one ragged matmul instead of E masked ones),
    scatter-add back. No capacity => no dropped tokens => ``overflow_frac``
    is identically 0; load-imbalance metrics are still reported.

    TPU-native analog of the reference's MegaBlocks-style dropless dispatch
    (rlinf/hybrid_engines/megatron/token_dispatcher.py + FUSCO fused
    all-to-all). Returns (out [B,S,D], aux_loss, metrics).
    """
    B, S, D = x.shape
    E, K = moe.num_experts, moe.num_experts_per_token
    N = B * S
    tokens = x.reshape(N, D)

    probs, topk_probs, topk_idx = _route(params, tokens, moe)

    flat_expert = topk_idx.reshape(N * K)                       # token-major
    order = jnp.argsort(flat_expert, stable=True)               # [NK]
    token_of = order // K                                       # source token
    xs = jnp.take(tokens, token_of, axis=0)                     # [NK, D]
    group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

    g = jax.lax.ragged_dot(xs, params["gate"], group_sizes)
    u = jax.lax.ragged_dot(xs, params["up"], group_sizes)
    h = (jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u)
    ys = jax.lax.ragged_dot(h, params["down"], group_sizes)     # [NK, D]

    w = jnp.take(topk_probs.reshape(N * K), order).astype(x.dtype)
    out = jnp.zeros((N, D), x.dtype).at[token_of].add(ys * w[:, None])

    # Switch aux loss on true routed fractions (no capacity truncation).
    # ce normalizes counts by N*K — the same /topk convention as the
    # capacity path's ce, so switching moe_impl keeps the loss scale.
    me = jnp.mean(probs, axis=0)                                # [E]
    ce = group_sizes.astype(jnp.float32) / float(N * K)
    aux_loss = moe.aux_loss_coef * E * jnp.sum(me * ce)
    load = group_sizes.astype(jnp.float32) * (E / float(N * K))
    metrics = {
        "moe_overflow_frac": jnp.zeros((), jnp.float32),
        "moe_max_load": jnp.max(load),          # 1.0 == perfectly balanced
        "moe_min_load": jnp.min(load),
    }
    return out.reshape(B, S, D), aux_loss, metrics


def capacity_overflow_frac(
    params: Dict[str, jax.Array], x: jax.Array, moe: MoEConfig
) -> jax.Array:
    """Fraction of (token, choice) routings dropped by the capacity einsum
    path — the capacity-overflow metric the dropless path makes zero."""
    B, S, _ = x.shape
    N = B * S
    E, K = moe.num_experts, moe.num_experts_per_token
    tokens = x.reshape(N, -1)
    _, _, topk_idx = _route(params, tokens, moe)
    capacity = int(max(1, round(N * K / E * moe.capacity_factor)))
    flat_expert = topk_idx.transpose(1, 0).reshape(N * K)
    onehot = jax.nn.one_hot(flat_expert, E, dtype=jnp.float32)
    position = (jnp.cumsum(onehot, axis=0) - onehot) * onehot
    kept = jnp.sum(onehot * (position < capacity))
    return 1.0 - kept / float(N * K)


def moe_layer_dropless_ep(
    params: Dict[str, jax.Array],
    x: jax.Array,                 # [B, S, D], B sharded over ``axis``
    moe: MoEConfig,
    mesh,
    axis: str = "expert",
) -> Tuple[jax.Array, jax.Array]:
    """Expert-parallel dropless MoE: explicit shard_map over the ``axis``
    mesh axis with ``lax.ragged_all_to_all`` token exchange — the TPU-native
    analog of the reference's MoE token dispatcher + FUSCO fused all-to-all
    (rlinf/hybrid_engines/megatron/token_dispatcher.py).

    Per shard: route local tokens -> stable-sort (token, choice) pairs by
    global expert (destination chunks become contiguous) -> ragged_all_to_all
    pairs to the shards owning their experts -> local grouped GEMMs
    (lax.ragged_dot, zero-weight padding group absorbs unused buffer rows)
    -> reverse ragged_all_to_all -> unsort + gate-weighted combine. Unlike
    the SPMD capacity einsum, communication volume is exactly the routed
    tokens (no capacity padding) and nothing is dropped.

    Expert weights must be sharded over ``axis`` on their E dimension; the
    router is replicated. Returns (out [B,S,D], aux_loss).
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ep = mesh.shape[axis]
    E, K = moe.num_experts, moe.num_experts_per_token
    assert E % ep == 0, f"num_experts {E} not divisible by mesh.{axis}={ep}"
    E_local = E // ep
    B, S, D = x.shape
    assert B % ep == 0, f"batch {B} not divisible by mesh.{axis}={ep}"
    # XLA:CPU has no ragged-all-to-all thunk; the all_gather emulation keeps
    # the routing math identical so the virtual-mesh tests cover it. The
    # fallback all-gathers the full buffer (O(ep^2 * M) comm) — it exists
    # for CPU tests only; non-CPU backends take the ragged collective.
    # ``FORCE_RAGGED`` lets tests pin either branch explicitly.
    if FORCE_RAGGED is not None:
        use_ragged = FORCE_RAGGED
    else:
        use_ragged = jax.default_backend() != "cpu"

    def exchange(operand, out_buf, G, me):
        """Send rows of ``operand`` per size-matrix ``G`` (G[i,j] = rows
        shard i sends shard j); chunks land receiver-side ordered by sender.
        Rows of ``out_buf`` beyond the received total keep their values."""
        send_sz = G[me, :]
        in_off = (jnp.cumsum(G, axis=1) - G)[me, :]
        recv_sz = G[:, me]
        recv_off = jnp.cumsum(recv_sz) - recv_sz
        if use_ragged:
            return jax.lax.ragged_all_to_all(
                operand, out_buf, in_off, send_sz,
                (jnp.cumsum(G, axis=0) - G)[me, :], recv_sz, axis_name=axis,
            )
        allx = jax.lax.all_gather(operand, axis)        # [ep, rows, ...]
        in_off_all = jnp.cumsum(G, axis=1) - G
        r = jnp.arange(out_buf.shape[0])
        snd = jnp.searchsorted(recv_off + recv_sz, r, side="right")
        snd = jnp.minimum(snd, ep - 1)
        src = jnp.clip(in_off_all[snd, me] + (r - recv_off[snd]),
                       0, operand.shape[0] - 1)
        vals = allx[snd, src]
        valid = r < jnp.sum(recv_sz)
        if out_buf.ndim > 1:
            valid = valid[:, None]
        return jnp.where(valid, vals, out_buf)

    def per_shard(router, gate, up, down, xs_blk):
        b, s, _ = xs_blk.shape
        n = b * s
        M = n * K                       # local (token, choice) pairs
        cap = M * ep                    # worst-case receive buffer
        tokens = xs_blk.reshape(n, D)
        me = jax.lax.axis_index(axis)

        probs, topk_probs, topk_idx = _route({"router": router}, tokens, moe)
        flat_expert = topk_idx.reshape(M)
        order = jnp.argsort(flat_expert, stable=True)
        token_of = order // K
        xs = jnp.take(tokens, token_of, axis=0)                  # [M, D]
        sorted_expert = jnp.take(flat_expert, order)             # [M]

        counts = jnp.bincount(flat_expert, length=E).astype(jnp.int32)
        send_sizes = counts.reshape(ep, E_local).sum(-1)         # [ep]
        # Full size matrix: row i = shard i's send_sizes.
        SM = jax.lax.all_gather(send_sizes, axis)                # [ep, ep]

        recv_x = exchange(xs, jnp.zeros((cap, D), xs.dtype), SM, me)
        # Sentinel >= E marks untouched buffer rows (padding group).
        recv_e = exchange(sorted_expert, jnp.full((cap,), E, jnp.int32),
                          SM, me)
        local_e = jnp.where(recv_e >= E, E_local, recv_e - me * E_local)

        order2 = jnp.argsort(local_e, stable=True)
        xs2 = jnp.take(recv_x, order2, axis=0)
        gs = jnp.bincount(
            jnp.minimum(local_e, E_local), length=E_local + 1
        ).astype(jnp.int32)
        pad = lambda w: jnp.concatenate(
            [w, jnp.zeros((1,) + w.shape[1:], w.dtype)], 0
        )
        g = jax.lax.ragged_dot(xs2, pad(gate), gs)
        u = jax.lax.ragged_dot(xs2, pad(up), gs)
        h = jax.nn.silu(g.astype(jnp.float32)).astype(xs2.dtype) * u
        ys2 = jax.lax.ragged_dot(h, pad(down), gs)               # [cap, D]
        recv_y = jnp.zeros_like(ys2).at[order2].set(ys2)

        # Reverse trip (size matrix transposed): chunks return to their
        # original positions in each sender's sorted buffer.
        ys = exchange(recv_y, jnp.zeros((M, D), recv_y.dtype), SM.T, me)

        w = jnp.take(topk_probs.reshape(M), order).astype(xs_blk.dtype)
        out = jnp.zeros((n, D), xs_blk.dtype).at[token_of].add(
            ys * w[:, None]
        )

        # Global Switch aux loss via psums.
        n_total = n * ep
        me_g = jax.lax.psum(jnp.sum(probs, axis=0), axis) / n_total
        ce_g = jax.lax.psum(counts, axis).astype(jnp.float32) / (n_total * K)
        aux = moe.aux_loss_coef * E * jnp.sum(me_g * ce_g)
        return out.reshape(b, s, D), aux

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_rep=False,
    )
    return fn(params["router"], params["gate"], params["up"],
              params["down"], x)
