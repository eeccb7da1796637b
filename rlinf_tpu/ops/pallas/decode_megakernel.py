"""Whole-decode-step Pallas TPU megakernel.

Round-4 attribution (docs/perf_notes_r4.md) measured a ~24 µs fixed cost per
``pallas_call`` on this runtime — and, worse, pallas calls exclude
themselves from XLA's async DMA pipelining, so the weight prefetch for
layer i+1 never overlaps layer i's attention kernel.  At serving batch
sizes that launch+serialization floor is ~26%% of the 0.5B decode step.

This kernel runs ALL layers of one decode step in a single ``pallas_call``:

  * Grid = (layer, phase).  Phases walk each layer's compute —
    [qkv matmul] → [attention] → [o-proj] → [gate tiles] → [up tiles] →
    [down tiles] — and every weight matmul streams its int8 chunk through
    ONE uniform [D, CW] window whose index map reads a prefetched
    phase→chunk table.  Mosaic double-buffers the window across grid steps,
    so the whole step becomes a single continuous weight stream at HBM
    rate, with the MXU working under it.
  * The int8 KV cache lives in HBM (``memory_space=ANY``), read-only. The
    attention phase quantizes the current token's k/v and emits them as
    per-layer outputs; the host wrapper inserts them with one fused
    in-place ``dynamic_update_slice`` after the kernel. Past-token blocks
    stream through a manually double-buffered VMEM window (row-group ×
    kv-block tiles). Reads exclude the current slot (its contribution is
    added exactly, in f32, from registers), so deferring the cache write
    races nothing.
  * RoPE is applied in-kernel on the packed [B, H*Hd] layout: rotate_half
    is two ``pltpu.roll``s (±Hd/2 lanes) select-combined per half-band —
    no head-split relayout.
  * The residual stream ``x`` persists in a VMEM f32 scratch across all
    grid steps; only the embedded token enters and the final hidden leaves.

Layout requirements (asserted): num_heads*head_dim == hidden_size, no
qk-norm, fused int8 decode weights (models/llm/quant.py quantize_params).
Per-layer weights are repacked once by ``pack_decode_weights`` into the
uniform chunk stream; zero-padding makes partial tiles harmless (silu(0)*0
= 0 for gate/up, zero rows contribute nothing for down).

Semantics match ``decode_step_packed_q8`` (static engine: scalar write
slot) with two deliberate precision upgrades: the current token's
attention contribution skips the int8 round-trip, and the residual stream
accumulates in f32.  Parity is gated on-chip (tests/tpu/test_onchip_parity
``megakernel`` check).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.quant import QTensor

NEG_INF = -2.0**30


@dataclasses.dataclass(frozen=True)
class MegaPlan:
    """Static phase/chunk layout for one model geometry."""

    D: int          # hidden == num_heads * head_dim
    QD: int
    KVD: int        # num_kv_heads * head_dim
    H: int
    Kv: int
    Hd: int
    Hp: int         # sublane-padded head count
    F: int
    L: int
    CW: int         # chunk width (lanes per weight tile)
    eps: float
    n_qkv: int
    n_wo: int
    n_f: int

    @property
    def w_qkv(self) -> int:
        return self.QD + 2 * self.KVD

    @property
    def attn_p(self) -> int:
        return self.n_qkv

    @property
    def wo_p0(self) -> int:
        return self.n_qkv + 1

    @property
    def gate_p0(self) -> int:
        return self.wo_p0 + self.n_wo

    @property
    def up_p0(self) -> int:
        return self.gate_p0 + self.n_f

    @property
    def down_p0(self) -> int:
        return self.up_p0 + self.n_f

    @property
    def nph(self) -> int:
        return self.down_p0 + self.n_f

    @property
    def nchk(self) -> int:
        return self.nph - 1

    def chunk_table(self):
        """chunk index (within a layer) for each phase; the attention phase
        clamps to the previous chunk so Mosaic elides its DMA."""
        tbl = []
        c = 0
        for p in range(self.nph):
            if p == self.attn_p:
                tbl.append(c - 1)
            else:
                tbl.append(c)
                c += 1
        return tbl


def make_plan(cfg: LLMConfig, chunk_width: int = 2048) -> MegaPlan:
    D = cfg.hidden_size
    Hd = cfg.head_dim_
    QD = cfg.num_heads * Hd
    KVD = cfg.num_kv_heads * Hd
    assert QD == D, "megakernel requires num_heads*head_dim == hidden_size"
    assert not cfg.qk_norm, "megakernel does not support qk-norm models"
    assert not cfg.is_moe, "megakernel is dense-MLP only"
    # the down-projection's per-out-channel scales ([D]) ride in one CW-wide
    # scale slot (pack_decode_weights), so the chunk must span hidden
    assert chunk_width >= D, (
        f"megakernel chunk_width {chunk_width} must be >= hidden {D}")
    CW = chunk_width
    return MegaPlan(
        D=D, QD=QD, KVD=KVD, H=cfg.num_heads, Kv=cfg.num_kv_heads, Hd=Hd,
        # sublane-pad the head count to a multiple of 8: scratch like
        # q3/m/l/acc is [B, Hp, ...] and Mosaic lowers row indexing on a
        # non-8-multiple sublane dim through an unsupported gather
        Hp=-(-cfg.num_heads // 8) * 8, F=cfg.intermediate_size,
        L=cfg.num_layers,
        CW=CW, eps=cfg.rms_eps,
        n_qkv=math.ceil((QD + 2 * KVD) / CW),
        n_wo=math.ceil(D / CW),
        n_f=math.ceil(cfg.intermediate_size / CW),
    )


class MegaWeights(NamedTuple):
    stream: jax.Array    # [L*NCHK, D, CW] int8
    scales: jax.Array    # [L*NCHK, 1, CW] f32
    norms: jax.Array     # [L, 2, D] f32 (attn_norm, mlp_norm)
    bias: jax.Array      # [L, 1, n_qkv*CW] f32 (qkv bias, zero-padded)
    tbl: jax.Array       # [NPH] int32 chunk table


def _chunk_cols(q: jax.Array, s: jax.Array, n: int, CW: int, D: int):
    """QTensor ([L, D, W], scale [L, 1, W]) -> ([L, n, D, CW], [L, n, CW])."""
    L, d, w = q.shape
    pad = n * CW - w
    qp = jnp.pad(q, ((0, 0), (0, D - d), (0, pad)))
    sp = jnp.pad(s.reshape(L, w), ((0, 0), (0, pad)))
    qc = qp.reshape(L, D, n, CW).transpose(0, 2, 1, 3)
    return qc, sp.reshape(L, n, CW)


def pack_decode_weights(qparams: dict, cfg: LLMConfig,
                        chunk_width: int = 2048) -> Tuple[MegaPlan, MegaWeights]:
    """Fused int8 decode params (quantize_params(fuse=True)) -> chunk stream."""
    plan = make_plan(cfg, chunk_width)
    b = qparams["blocks"]
    assert "wqkv" in b and "wgu" in b, (
        "megakernel needs fused decode weights (quantize_params fuse=True)")
    D, CW, L = plan.D, plan.CW, plan.L

    wqkv: QTensor = b["wqkv"]
    wo: QTensor = b["wo"]
    wgu: QTensor = b["wgu"]
    down: QTensor = b["down"]
    F = plan.F

    qkv_c, qkv_s = _chunk_cols(wqkv.q, wqkv.scale, plan.n_qkv, CW, D)
    wo_c, wo_s = _chunk_cols(wo.q, wo.scale, plan.n_wo, CW, D)
    gate_c, gate_s = _chunk_cols(
        wgu.q[..., :F], wgu.scale[..., :F], plan.n_f, CW, D)
    up_c, up_s = _chunk_cols(
        wgu.q[..., F:], wgu.scale[..., F:], plan.n_f, CW, D)
    # down [L, F, D] -> transposed chunks [L, n_f, D, CW] over the F axis;
    # its per-out-channel scale ([D]) rides in the chunk scale slot, padded.
    downT = jnp.swapaxes(down.q, 1, 2)                       # [L, D, F]
    pad_f = plan.n_f * CW - F
    downT = jnp.pad(downT, ((0, 0), (0, 0), (0, pad_f)))
    down_c = downT.reshape(L, D, plan.n_f, CW).transpose(0, 2, 1, 3)
    dscale = jnp.pad(down.scale.reshape(L, D), ((0, 0), (0, CW - D)))
    down_s = jnp.broadcast_to(dscale[:, None, :], (L, plan.n_f, CW))

    stream = jnp.concatenate(
        [qkv_c, wo_c, gate_c, up_c, down_c], axis=1
    ).reshape(L * plan.nchk, D, CW)
    scales = jnp.concatenate(
        [qkv_s, wo_s, gate_s, up_s, down_s], axis=1
    ).reshape(L * plan.nchk, 1, CW).astype(jnp.float32)

    norms = jnp.stack(
        [b["attn_norm"].astype(jnp.float32), b["mlp_norm"].astype(jnp.float32)],
        axis=1,
    )                                                        # [L, 2, D]
    bw = plan.n_qkv * CW
    if "bq" in b:
        bias = jnp.concatenate(
            [b["bq"], b["bk"], b["bv"]], axis=-1).astype(jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, bw - bias.shape[-1])))
        bias = bias[:, None, :]
    else:
        bias = jnp.zeros((L, 1, bw), jnp.float32)
    tbl = jnp.asarray(plan.chunk_table(), jnp.int32)
    return plan, MegaWeights(stream, scales, norms, bias, tbl)


def _rot_half_packed(x: jax.Array, hd: int) -> jax.Array:
    """rotate_half on a packed [B, n_heads*hd] layout: per head band,
    [x1, x2] -> [-x2, x1], via two lane rolls + a half-band select."""
    half = hd // 2
    dim = x.shape[1]
    # pltpu.roll(x, s): lane l <- x[(l - s) mod dim]; a "negative" roll is
    # dim - half. Wraparound lanes land in the half the select discards.
    minus = pltpu.roll(x, dim - half, 1)   # lane l <- x[l + half]
    plus = pltpu.roll(x, half, 1)          # lane l <- x[l - half]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    first = (lane % hd) < half
    return jnp.where(first, -minus, plus)


def _rms(x: jax.Array, w_row: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(x * x, axis=1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)) * w_row[None, :]


def _mega_kernel(
    # scalar prefetch
    tbl_ref,       # [NPH] i32
    meta_ref,      # [4] i32: max wp, nj (kv blocks), lo (first block), pad
    starts_ref,    # [B] i32
    wps_ref,       # [B] i32 per-row write positions (ragged serving pools)
    # tensor inputs
    ws_ref,        # [1, D, CW] int8 (streamed chunk)
    wsc_ref,       # [1, 1, CW] f32
    norms_ref,     # [1, 2, D] f32
    bias_ref,      # [1, 1, BW] f32
    x0_ref,        # [B, D] bf16
    cosq_ref, sinq_ref,    # [B, QD] f32
    cosk_ref, sink_ref,    # [B, KVD] f32
    kc_ref, vc_ref,        # [L, B, S, KVD] int8 (ANY, read-only)
    ks_ref, vs_ref,        # [L, B, S] f32 (ANY, read-only)
    # outputs
    out_ref,               # [B, D] bf16
    knew_ref, vnew_ref,    # [1, B, KVD] int8 (layer block l)
    ksnew_ref, vsnew_ref,  # [1, 1, B] f32
    # scratch
    x_sc,          # [B, D] f32
    hn_sc,         # [B, D] bf16
    qkv_sc,        # [B, n_qkv*CW] f32
    q3_sc,         # [B, Hp, KVD] f32
    m_sc, l_sc,    # [B, Hp, 128] f32
    acc_sc,        # [B, Hp, KVD] f32
    att_sc,        # [B, D] bf16
    gs_sc,         # [B, n_f*CW] bf16
    kbuf, vbuf,    # [2, RG, BLK, KVD] int8
    ksbuf, vsbuf,  # [2, RG, BLK] f32
    rsem,          # DMA sems (2, 4)
    *,
    plan: MegaPlan,
    B: int,
    S: int,
    RG: int,
    BLK: int,
):
    P = plan
    l = pl.program_id(0)
    p = pl.program_id(1)
    scale = P.Hd ** -0.5
    G = P.H // P.Kv

    @pl.when((l == 0) & (p == 0))
    def _seed_x():
        x_sc[:] = x0_ref[:].astype(jnp.float32)

    # ---------------- qkv projection ----------------
    for s in range(P.n_qkv):
        @pl.when(p == s)
        def _qkv(s=s):
            if s == 0:
                hn_sc[:] = _rms(
                    x_sc[:], norms_ref[0, 0], P.eps
                ).astype(jnp.bfloat16)
            w = ws_ref[0].astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                hn_sc[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * wsc_ref[0, 0][None, :]
            qkv_sc[:, s * P.CW:(s + 1) * P.CW] = out

    # ---------------- attention ----------------
    @pl.when(p == P.attn_p)
    def _attn():
        nj = meta_ref[1]
        lo = meta_ref[2]

        qkvb = qkv_sc[:, :P.w_qkv] + bias_ref[0, 0, :P.w_qkv][None, :]
        q = qkvb[:, :P.QD]
        k = qkvb[:, P.QD:P.QD + P.KVD]
        v = qkvb[:, P.QD + P.KVD:P.w_qkv]
        q = q * cosq_ref[:] + _rot_half_packed(q, P.Hd) * sinq_ref[:]
        k = k * cosk_ref[:] + _rot_half_packed(k, P.Hd) * sink_ref[:]

        # Quantize the current token's k/v and emit them as per-layer
        # OUTPUTS ([L, B, KVD] blocks); the caller inserts them into the
        # HBM cache with one fused in-place dynamic_update_slice AFTER the
        # kernel. (A single-slot write DMA into the cache from inside the
        # kernel hits Mosaic's 8-row tiling rule whenever the cache is
        # small enough to be VMEM-placed — and the reads below exclude
        # slot wp anyway, so deferring the write races nothing.)
        ksv = jnp.maximum(jnp.max(jnp.abs(k), 1, keepdims=True) / 127.0, 1e-8)
        vsv = jnp.maximum(jnp.max(jnp.abs(v), 1, keepdims=True) / 127.0, 1e-8)
        knew_ref[0] = jnp.clip(
            jnp.round(k / ksv), -127, 127).astype(jnp.int8)
        vnew_ref[0] = jnp.clip(
            jnp.round(v / vsv), -127, 127).astype(jnp.int8)
        ksnew_ref[0, 0, :] = ksv[:, 0]
        vsnew_ref[0, 0, :] = vsv[:, 0]

        # pack q into per-kv-head lane bands (zero elsewhere): one dot per
        # row then yields every head's scores against the packed kv block.
        q3_sc[:] = jnp.zeros_like(q3_sc)
        for h in range(P.H):
            kvh = h // G
            q3_sc[:, h, kvh * P.Hd:(kvh + 1) * P.Hd] = (
                q[:, h * P.Hd:(h + 1) * P.Hd])

        # online softmax state, seeded with the current token (p_cur = 1)
        s_cur = jnp.sum(
            q3_sc[:] * k[:, None, :], axis=2, keepdims=True
        ) * scale                                     # [B, Hp, 1]
        m_sc[:] = jnp.broadcast_to(s_cur, m_sc.shape)
        l_sc[:] = jnp.ones_like(l_sc)
        acc_sc[:] = jnp.broadcast_to(v[:, None, :], acc_sc.shape)

        n_groups = B // RG
        n_it = n_groups * nj

        def get_dma(slot, it):
            g = it // nj
            j = lo + it % nj
            return (
                pltpu.make_async_copy(
                    kc_ref.at[l, pl.ds(g * RG, RG), pl.ds(j * BLK, BLK), :],
                    kbuf.at[slot], rsem.at[slot, 0]),
                pltpu.make_async_copy(
                    vc_ref.at[l, pl.ds(g * RG, RG), pl.ds(j * BLK, BLK), :],
                    vbuf.at[slot], rsem.at[slot, 1]),
                pltpu.make_async_copy(
                    ks_ref.at[l, pl.ds(g * RG, RG), pl.ds(j * BLK, BLK)],
                    ksbuf.at[slot], rsem.at[slot, 2]),
                pltpu.make_async_copy(
                    vs_ref.at[l, pl.ds(g * RG, RG), pl.ds(j * BLK, BLK)],
                    vsbuf.at[slot], rsem.at[slot, 3]),
            )

        @pl.when(n_it > 0)
        def _warm():
            for c in get_dma(0, 0):
                c.start()

        def body(it, _):
            slot = jax.lax.rem(it, 2)
            nxt = jax.lax.rem(it + 1, 2)

            @pl.when(it + 1 < n_it)
            def _pf():
                for c in get_dma(nxt, it + 1):
                    c.start()

            for c in get_dma(slot, it):
                c.wait()
            g = it // nj
            j = lo + it % nj
            jlo = j * BLK
            for r in range(RG):
                row = g * RG + r
                qr = q3_sc[row]                              # [Hp, KVD]
                kr = kbuf[slot, r].astype(jnp.float32)       # [BLK, KVD]
                sc = jax.lax.dot_general(
                    qr, kr, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale * ksbuf[slot, r][None, :]          # [Hp, BLK]
                pos = jlo + jax.lax.broadcasted_iota(
                    jnp.int32, (P.Hp, BLK), 1)
                valid = (pos >= starts_ref[row]) & (pos < wps_ref[row])
                sc = jnp.where(valid, sc, NEG_INF)
                m_prev = m_sc[row, :, :1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sc, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                pr = jnp.where(valid, jnp.exp(sc - m_new), 0.0)
                l_new = l_sc[row, :, :1] * alpha + jnp.sum(
                    pr, axis=1, keepdims=True)
                vr = vbuf[slot, r].astype(jnp.float32)
                acc_sc[row] = acc_sc[row] * alpha + jax.lax.dot_general(
                    pr * vsbuf[slot, r][None, :], vr,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_sc[row] = jnp.broadcast_to(m_new, m_sc.shape[1:])
                l_sc[row] = jnp.broadcast_to(l_new, l_sc.shape[1:])
            return 0

        jax.lax.fori_loop(0, n_it, body, 0)

        out = acc_sc[:] / jnp.maximum(l_sc[:, :, :1], 1e-30)
        for h in range(P.H):
            kvh = h // G
            att_sc[:, h * P.Hd:(h + 1) * P.Hd] = out[
                :, h, kvh * P.Hd:(kvh + 1) * P.Hd].astype(jnp.bfloat16)

    # ---------------- o-projection ----------------
    for s in range(P.n_wo):
        @pl.when(p == P.wo_p0 + s)
        def _wo(s=s):
            w = ws_ref[0].astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                att_sc[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * wsc_ref[0, 0][None, :]
            vcols = min(P.CW, P.D - s * P.CW)
            x_sc[:, s * P.CW:s * P.CW + vcols] = (
                x_sc[:, s * P.CW:s * P.CW + vcols] + out[:, :vcols])

    # ---------------- MLP: gate ----------------
    for s in range(P.n_f):
        @pl.when(p == P.gate_p0 + s)
        def _gate(s=s):
            if s == 0:
                hn_sc[:] = _rms(
                    x_sc[:], norms_ref[0, 1], P.eps
                ).astype(jnp.bfloat16)
            w = ws_ref[0].astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                hn_sc[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * wsc_ref[0, 0][None, :]
            gs_sc[:, s * P.CW:(s + 1) * P.CW] = g.astype(jnp.bfloat16)

    # ---------------- MLP: up (+ silu fuse) ----------------
    for s in range(P.n_f):
        @pl.when(p == P.up_p0 + s)
        def _up(s=s):
            w = ws_ref[0].astype(jnp.bfloat16)
            u = jax.lax.dot_general(
                hn_sc[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * wsc_ref[0, 0][None, :]
            g = gs_sc[:, s * P.CW:(s + 1) * P.CW].astype(jnp.float32)
            gu = g * jax.nn.sigmoid(g) * u
            gs_sc[:, s * P.CW:(s + 1) * P.CW] = gu.astype(jnp.bfloat16)

    # ---------------- MLP: down (+ residual) ----------------
    for s in range(P.n_f):
        @pl.when(p == P.down_p0 + s)
        def _down(s=s):
            w = ws_ref[0].astype(jnp.bfloat16)
            gu = gs_sc[:, s * P.CW:(s + 1) * P.CW]
            out = jax.lax.dot_general(
                gu, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [B, D]
            # direct ref slice (static, lane-aligned): loading the full row
            # and numpy-slicing it lowers through an unsupported >2D gather
            # whenever D < CW
            x_sc[:] = x_sc[:] + out * wsc_ref[0, 0, :P.D][None, :]

    @pl.when((l == P.L - 1) & (p == P.nph - 1))
    def _emit():
        out_ref[:] = x_sc[:].astype(jnp.bfloat16)


def decode_step_mega(
    plan: MegaPlan,
    mw: MegaWeights,
    x0: jax.Array,          # [B, D] bf16 embedded current token
    kc: jax.Array,          # [L, B, S, KVD] int8
    vc: jax.Array,
    ks: jax.Array,          # [L, B, S] f32
    vs: jax.Array,
    write_pos: jax.Array,   # int32 cache slot: scalar (static engine,
                            # lockstep) or [B] per-row (continuous serving)
    positions: jax.Array,   # [B] int32 rope positions
    starts: jax.Array,      # [B] int32 first valid slot
    cos_tab: jax.Array,     # [S_rope, Hd] f32
    sin_tab: jax.Array,
    *,
    row_group: int = 8,
    kv_block: int = 512,
    interpret=None,
):
    """One whole decode step. Returns (hidden [B, D] bf16, kc, vc, ks, vs).

    The returned caches are the inputs with slot ``write_pos``
    filled; the final rms_norm and lm-head run outside (see sampler)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = plan
    B = x0.shape[0]
    S = kc.shape[2]
    # The kv-scale stream buffers ([2, RG, BLK] f32) make BLK a lane
    # dimension: Mosaic requires it be a multiple of 128 (generate() pads
    # S_max up for the mega path).
    assert S % 128 == 0, f"megakernel needs S_max % 128 == 0, got {S}"
    assert B % 8 == 0, f"megakernel needs batch % 8 == 0, got {B}"
    BLK = min(max(kv_block, 128), S)
    while S % BLK:
        BLK //= 2
    assert BLK % 128 == 0, (S, BLK)
    RG = row_group
    while B % RG:
        RG //= 2

    cos_p = cos_tab[positions]                      # [B, Hd] f32
    sin_p = sin_tab[positions]
    cosq = jnp.tile(cos_p, (1, P.H)).astype(jnp.float32)
    sinq = jnp.tile(sin_p, (1, P.H)).astype(jnp.float32)
    cosk = jnp.tile(cos_p, (1, P.Kv)).astype(jnp.float32)
    sink = jnp.tile(sin_p, (1, P.Kv)).astype(jnp.float32)

    uniform_slot = jnp.ndim(write_pos) == 0
    wps = jnp.broadcast_to(
        jnp.asarray(write_pos, jnp.int32), (B,))
    wp_max = jnp.max(wps)
    lo = jnp.min(starts.astype(jnp.int32)) // BLK
    hi = (wp_max + BLK - 1) // BLK
    nj = jnp.maximum(hi - lo, 0)
    meta = jnp.stack([wp_max, nj, lo, jnp.int32(0)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(P.L, P.nph),
        in_specs=[
            pl.BlockSpec(
                (1, P.D, P.CW),
                lambda l, p, tbl, meta, st, wr: (l * P.nchk + tbl[p], 0, 0)),
            pl.BlockSpec(
                (1, 1, P.CW),
                lambda l, p, tbl, meta, st, wr: (l * P.nchk + tbl[p], 0, 0)),
            pl.BlockSpec((1, 2, P.D), lambda l, p, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, P.n_qkv * P.CW), lambda l, p, *_: (l, 0, 0)),
            pl.BlockSpec((B, P.D), lambda l, p, *_: (0, 0)),
            pl.BlockSpec((B, P.QD), lambda l, p, *_: (0, 0)),
            pl.BlockSpec((B, P.QD), lambda l, p, *_: (0, 0)),
            pl.BlockSpec((B, P.KVD), lambda l, p, *_: (0, 0)),
            pl.BlockSpec((B, P.KVD), lambda l, p, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((B, P.D), lambda l, p, *_: (0, 0)),
            pl.BlockSpec((1, B, P.KVD), lambda l, p, *_: (l, 0, 0)),
            pl.BlockSpec((1, B, P.KVD), lambda l, p, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda l, p, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda l, p, *_: (l, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, P.D), jnp.float32),            # x
            pltpu.VMEM((B, P.D), jnp.bfloat16),           # hn
            pltpu.VMEM((B, P.n_qkv * P.CW), jnp.float32),  # qkv
            pltpu.VMEM((B, P.Hp, P.KVD), jnp.float32),    # q3
            pltpu.VMEM((B, P.Hp, 128), jnp.float32),      # m
            pltpu.VMEM((B, P.Hp, 128), jnp.float32),      # l
            pltpu.VMEM((B, P.Hp, P.KVD), jnp.float32),    # acc
            pltpu.VMEM((B, P.D), jnp.bfloat16),           # att
            pltpu.VMEM((B, P.n_f * P.CW), jnp.bfloat16),  # gs
            pltpu.VMEM((2, RG, BLK, P.KVD), jnp.int8),    # kbuf
            pltpu.VMEM((2, RG, BLK, P.KVD), jnp.int8),    # vbuf
            pltpu.VMEM((2, RG, BLK), jnp.float32),        # ksbuf
            pltpu.VMEM((2, RG, BLK), jnp.float32),        # vsbuf
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    kernel = functools.partial(
        _mega_kernel, plan=P, B=B, S=S, RG=RG, BLK=BLK,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, P.D), jnp.bfloat16),
            jax.ShapeDtypeStruct((P.L, B, P.KVD), jnp.int8),
            jax.ShapeDtypeStruct((P.L, B, P.KVD), jnp.int8),
            jax.ShapeDtypeStruct((P.L, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((P.L, 1, B), jnp.float32),
        ],
        # scratch + double-buffered windows + staged outputs sit ~0.3MB over
        # the default 16MB scoped-vmem limit at the 1.5B geometry; v5e has
        # 128MB of VMEM, so raise the scope
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(
        mw.tbl, meta, starts.astype(jnp.int32), wps,
        mw.stream, mw.scales, mw.norms, mw.bias,
        x0.astype(jnp.bfloat16), cosq, sinq, cosk, sink,
        kc, vc, ks, vs,
    )
    hidden, knew, vnew, ksn, vsn = out
    # Insert the current token at its write slot (in place: the caches are
    # dead after this point of the decode-loop carry, so XLA updates the
    # donated buffers without a copy).
    if uniform_slot:
        wp = wps[0]
        kc = jax.lax.dynamic_update_slice(
            kc, knew[:, :, None, :], (0, 0, wp, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, vnew[:, :, None, :], (0, 0, wp, 0))
        ks = jax.lax.dynamic_update_slice(
            ks, jnp.swapaxes(ksn, 1, 2), (0, 0, wp))
        vs = jax.lax.dynamic_update_slice(
            vs, jnp.swapaxes(vsn, 1, 2), (0, 0, wp))
    else:
        # ragged pool: per-row slots -> one scatter along the S axis
        rows = jnp.arange(B)
        kc = kc.at[:, rows, wps, :].set(knew)
        vc = vc.at[:, rows, wps, :].set(vnew)
        ks = ks.at[:, rows, wps].set(ksn[:, 0, :])
        vs = vs.at[:, rows, wps].set(vsn[:, 0, :])
    return hidden, kc, vc, ks, vs
