"""Fully-fused pre-LN cross-attention block kernel (text KV + optional
decoupled audio KV).

One kernel computes, per UNet cross-attention site (reference
attention_processor.py IPAttnProcessor2_0 / AttnProcessor2_0 semantics):

    y  = LN(x)
    q  = y Wq ;  k/v      = ctx_text Wk/Wv   (first ``num_ip`` context rows)
                 k_i/v_i  = ctx_ip  Wki/Wvi  (remaining rows; adapter sites)
    out = softmax(q k^T + bias) v  +  ip_scale * softmax(q k_i^T) v_i
    x + (out Wo + bo)

Contexts are short (8 GPT-2 tokens + <=128 pooled AudioMAE tokens, or <=512
T5 tokens), so the cost at the hot sites is dominated by the LN + the
[S,C]x[C,C] query/out projections and their HBM round-trips — exactly the
glue this kernel keeps in VMEM. K/V projections are computed once per batch
row (VMEM scratch persists across query tiles). Heads are packed in lanes
(the natural projection layout) and processed with the staircase trick per
128-lane group (ops/pallas_fused_block.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
LANES = 128

from ap_adapter_tpu.ops.pallas_fused_block import (
    _pad_head_dim,
    _pad_heads_in,
    _pad_heads_out,
    fused_block_applicable,
    pick_tile_q,
)


def _unpad_heads(a: jnp.ndarray, heads: int, d_in: int, d_p: int) -> jnp.ndarray:
    """[B, S, heads*d_p] -> [B, S, heads*d_in] (drop zero pad lanes)."""

    if d_p == d_in:
        return a
    b, s, _ = a.shape
    return a.reshape(b, s, heads, d_p)[..., :d_in].reshape(b, s, heads * d_in)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _staircase_attention(q, k_scr, v_scr, bias_row, sk_valid, heads, d):
    """q [tq, C] packed-head queries (pre-scaled); K/V scratch [Skp, C].
    Returns [tq, C]. bias_row: [1, Skp] additive fp32 or None."""

    tq, c = q.shape
    g = LANES // d
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    groups = []
    for g2 in range(c // LANES):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg = q[:, sl]
        kg = k_scr[:, sl]
        vg = v_scr[:, sl]
        qs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), qg, 0)
             for i in range(g)], axis=0)
        logits = jax.lax.dot_general(
            qs, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if sk_valid < k_scr.shape[0]:  # static: mask only when K was padded
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < sk_valid, logits, NEG_INF)
        if bias_row is not None:
            logits = logits + bias_row
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o_full = jax.lax.dot_general(
            p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom
        og = jnp.zeros((tq, LANES), jnp.float32)
        for i in range(g):
            blk = jax.lax.slice_in_dim(o_full, i * tq, (i + 1) * tq, axis=0)
            og = og + jnp.where((lane >= i * d) & (lane < (i + 1) * d), blk, 0)
        groups.append(og)
    return jnp.concatenate(groups, axis=1)  # [tq, C] fp32


def _kernel(x_tile_ref, ctx_ref, bias_ref, lns_ref, lnb_ref, wq_ref, wk_ref,
            wv_ref, wki_ref, wvi_ref, wo_ref, bo_ref, scale_ref, o_ref,
            k_scr, v_scr, ki_scr, vi_scr, *,
            heads: int, num_ip: int, sk_text: int, sk_ip: int, eps: float,
            sm_scale: float, has_ip: bool, has_bias: bool):
    j = pl.program_id(1)
    cq = wq_ref.shape[-1]  # heads * (padded) head dim
    d = cq // heads

    @pl.when(j == 0)
    def _():
        ctx = ctx_ref[0]  # [Skp_total, Dc]
        text = ctx[:k_scr.shape[0], :]
        k_scr[:, :] = jax.lax.dot_general(
            text, wk_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(k_scr.dtype)
        v_scr[:, :] = jax.lax.dot_general(
            text, wv_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(v_scr.dtype)
        if has_ip:
            ip = jax.lax.slice_in_dim(ctx, num_ip, num_ip + ki_scr.shape[0], axis=0)
            ki_scr[:, :] = jax.lax.dot_general(
                ip, wki_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(ki_scr.dtype)
            vi_scr[:, :] = jax.lax.dot_general(
                ip, wvi_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(vi_scr.dtype)

    xt = x_tile_ref[0]
    xn = _ln(xt, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32),
             eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)

    bias_row = bias_ref[0].astype(jnp.float32) if has_bias else None
    out = _staircase_attention(q, k_scr[:, :], v_scr[:, :], bias_row,
                               sk_text, heads, d)
    if has_ip:
        out_ip = _staircase_attention(q, ki_scr[:, :], vi_scr[:, :], None,
                                      sk_ip, heads, d)
        out = out + scale_ref[0, 0] * out_ip

    proj = jax.lax.dot_general(
        out.astype(xt.dtype), wo_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + proj).astype(o_ref.dtype)


def fused_ln_cross_attention(
    x: jnp.ndarray,          # [B, S, C]
    context: jnp.ndarray,    # [B, Sk, Dc]
    ln_scale, ln_bias,       # [C]
    wq,                      # [C, C]
    wk, wv,                  # [Dc, C]
    wo, bo,                  # [C, C], [C]
    heads: int,
    *,
    wk_ip=None, wv_ip=None,  # [Dc, C] (adapter sites)
    ip_scale=0.0,
    num_ip_tokens: int = 8,
    mask_bias: Optional[jnp.ndarray] = None,  # [B, Sk] additive (text part)
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + OutProj(CrossAttn(LN(x), ctx)) in one kernel. C % 128 == 0 and
    head_dim dividing 128 required (callers route)."""

    b, s, c = x.shape
    d_in = c // heads
    d_p = _pad_head_dim(d_in)
    assert d_p is not None and fused_block_applicable(heads, d_in) and c % LANES == 0
    cq = heads * d_p
    has_ip = wk_ip is not None
    sk_total = context.shape[1]
    if has_ip:
        sk_text, sk_ip = num_ip_tokens, sk_total - num_ip_tokens
    else:
        sk_text, sk_ip = sk_total, 0

    tile_q = pick_tile_q(s, min(tile_q, _round_up(s, 64)))
    sp = _round_up(s, tile_q)
    skp_text = _round_up(max(sk_text, 8), 8)
    skp_ip = _round_up(max(sk_ip, 8), 8)
    skp_total = _round_up(sk_total, 8)

    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    ctxp = jnp.pad(cast(context), ((0, 0), (0, skp_total - sk_total), (0, 0)))
    dc = context.shape[-1]

    if mask_bias is None:
        bias = jnp.zeros((b, 1, skp_text), jnp.float32)
        has_bias = False
    else:
        bias = jnp.pad(mask_bias.astype(jnp.float32),
                       ((0, 0), (0, skp_text - mask_bias.shape[1])))[:, None, :]
        has_bias = True

    zeros_w = jnp.zeros((dc, c), dt)
    wki = cast(wk_ip) if has_ip else zeros_w
    wvi = cast(wv_ip) if has_ip else zeros_w
    if d_p != d_in:
        # head padding folded into the weights (zero lanes — exact)
        wq = _pad_heads_in(cast(wq), heads, d_in, d_p)
        wk = _pad_heads_in(cast(wk), heads, d_in, d_p)
        wv = _pad_heads_in(cast(wv), heads, d_in, d_p)
        wki = _pad_heads_in(wki, heads, d_in, d_p)
        wvi = _pad_heads_in(wvi, heads, d_in, d_p)
        wo = _pad_heads_out(cast(wo), heads, d_in, d_p)

    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, num_ip=num_ip_tokens, sk_text=sk_text,
            sk_ip=sk_ip, eps=eps, sm_scale=float(d_in) ** -0.5,
            has_ip=has_ip, has_bias=has_bias,
        ),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp_total, dc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skp_text), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        scratch_shapes=[
            pltpu.VMEM((skp_text, cq), dt),
            pltpu.VMEM((skp_text, cq), dt),
            pltpu.VMEM((skp_ip, cq), dt),
            pltpu.VMEM((skp_ip, cq), dt),
        ],
        interpret=interpret,
    )(xp, ctxp, bias, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      cast(wq), cast(wk), cast(wv), wki, wvi, cast(wo), cast(bo).reshape(1, c),
      jnp.asarray(ip_scale, jnp.float32).reshape(1, 1))
    return out[:, :s]


def _kernel_kv(*refs, heads: int, sk_text: int, sk_ip: int, eps: float,
               sm_scale: float, has_ip: bool, has_bias: bool):
    """Cross-attention block with PRECOMPUTED K/V (models/hoist.py): the
    conditioning is step-invariant across the DDIM scan, so the projections
    run once per generate instead of once per step. The kernel keeps only the
    x-dependent work: LN, q/out projections, the two staircase attentions."""

    if has_ip:
        (x_tile_ref, k_ref, v_ref, ki_ref, vi_ref, bias_ref, lns_ref,
         lnb_ref, wq_ref, wo_ref, bo_ref, scale_ref, o_ref) = refs
    else:
        (x_tile_ref, k_ref, v_ref, bias_ref, lns_ref, lnb_ref,
         wq_ref, wo_ref, bo_ref, scale_ref, o_ref) = refs
    cq = wq_ref.shape[-1]
    d = cq // heads

    xt = x_tile_ref[0]
    xn = _ln(xt, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32),
             eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)

    bias_row = bias_ref[0].astype(jnp.float32) if has_bias else None
    out = _staircase_attention(q, k_ref[0], v_ref[0], bias_row,
                               sk_text, heads, d)
    if has_ip:
        out_ip = _staircase_attention(q, ki_ref[0], vi_ref[0], None,
                                      sk_ip, heads, d)
        out = out + scale_ref[0, 0] * out_ip

    proj = jax.lax.dot_general(
        out.astype(xt.dtype), wo_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + proj).astype(o_ref.dtype)


def fused_ln_cross_attention_kv(
    x: jnp.ndarray,           # [B, S, C]
    k: jnp.ndarray,           # [B, Skp_t, cq] — rows AND head-lanes pre-padded
    v: jnp.ndarray,           # [B, Skp_t, cq]
    ln_scale, ln_bias,        # [C]
    wq_p,                     # [C, cq] pre-padded (ops prep / hoist layout)
    wo_p, bo,                 # [cq, C], [C]
    heads: int,
    sk_text: int,             # true (unpadded) text key count
    *,
    ki: Optional[jnp.ndarray] = None,   # [B, Skp_ip, cq] adapter K
    vi: Optional[jnp.ndarray] = None,
    sk_ip: int = 0,
    ip_scale=0.0,
    bias_pre: Optional[jnp.ndarray] = None,  # [B, 1, Skp_t] fp32 additive
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + OutProj(CrossAttn(LN(x), precomputed K/V)) — inference-only (no
    VJP; the trainer keeps the projecting variant so weight grads flow)."""

    b, s, c = x.shape
    d_in = c // heads
    assert fused_block_applicable(heads, d_in) and c % LANES == 0
    cq = wq_p.shape[-1]
    has_ip = ki is not None

    tile_q = pick_tile_q(s, min(tile_q, _round_up(s, 64)))
    sp = _round_up(s, tile_q)
    skp_t = k.shape[1]
    skp_ip = ki.shape[1] if has_ip else 0

    dt = x.dtype
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    if bias_pre is None:
        bias = jnp.zeros((b, 1, skp_t), jnp.float32)
        has_bias = False
    else:
        bias = bias_pre
        has_bias = True

    kv_spec = lambda skp: pl.BlockSpec(
        (1, skp, cq), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        kv_spec(skp_t), kv_spec(skp_t),
    ]
    args = [xp, k, v]
    if has_ip:
        in_specs += [kv_spec(skp_ip), kv_spec(skp_ip)]
        args += [ki, vi]
    in_specs += [
        pl.BlockSpec((1, 1, skp_t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    args += [bias, jnp.asarray(ln_scale, dt).reshape(1, c),
             jnp.asarray(ln_bias, dt).reshape(1, c), jnp.asarray(wq_p, dt),
             jnp.asarray(wo_p, dt), jnp.asarray(bo, dt).reshape(1, c),
             jnp.asarray(ip_scale, jnp.float32).reshape(1, 1)]

    out = pl.pallas_call(
        functools.partial(
            _kernel_kv, heads=heads, sk_text=sk_text, sk_ip=sk_ip, eps=eps,
            sm_scale=float(d_in) ** -0.5, has_ip=has_ip, has_bias=has_bias),
        grid=(b, sp // tile_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        interpret=interpret,
    )(*args)
    return out[:, :s]


def _staircase_attention_bwd(q, gattn, k_scr, v_scr, bias_row, sk_valid,
                             heads, d, want_dkv: bool):
    """Backward of _staircase_attention for one query tile.

    q [tq, C] pre-scaled packed-head queries; gattn [tq, C] cotangent of the
    (normalized) attention output. Returns (dq [tq, C] fp32 — gradient wrt
    the pre-scaled q — and, when ``want_dkv``, dk/dv [Skp, C] fp32 for this
    tile). The staircase zero-lane blocks route each head's contribution to
    its own lanes in both directions."""

    tq, c = q.shape
    skp = k_scr.shape[0]
    g = LANES // d
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    dq_groups, dk_groups, dv_groups = [], [], []
    for g2 in range(c // LANES):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg, kg, vg = q[:, sl], k_scr[:, sl], v_scr[:, sl]
        gg = gattn[:, sl]
        qs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), qg, 0)
             for i in range(g)], axis=0)
        gs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), gg, 0)
             for i in range(g)], axis=0)
        logits = jax.lax.dot_general(
            qs, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if sk_valid < k_scr.shape[0]:  # static: mask only when K was padded
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < sk_valid, logits, NEG_INF)
        if bias_row is not None:
            logits = logits + bias_row
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        probs32 = p / jnp.sum(p, axis=-1, keepdims=True)
        probs = probs32.astype(qg.dtype)

        dp = jax.lax.dot_general(
            gs, vg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        rowdot = jnp.sum(dp * probs32, axis=-1, keepdims=True)
        dlog = (probs32 * (dp - rowdot)).astype(qg.dtype)  # [g*tq, Skp]

        dq_full = jax.lax.dot_general(
            dlog, kg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dqg = jnp.zeros((tq, LANES), jnp.float32)
        for i in range(g):
            blk = jax.lax.slice_in_dim(dq_full, i * tq, (i + 1) * tq, axis=0)
            dqg = dqg + jnp.where((lane >= i * d) & (lane < (i + 1) * d), blk, 0)
        dq_groups.append(dqg)
        if want_dkv:
            dk_groups.append(jax.lax.dot_general(
                dlog, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dv_groups.append(jax.lax.dot_general(
                probs, gs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dq = jnp.concatenate(dq_groups, axis=1)
    if not want_dkv:
        return dq, None, None
    return dq, jnp.concatenate(dk_groups, axis=1), jnp.concatenate(dv_groups, axis=1)


def _bwd_kernel(x_full_ref, g_full_ref, x_tile_ref, g_tile_ref, ctx_ref,
                bias_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wki_ref,
                wvi_ref, wo_ref, scale_ref,
                dx_ref, dki_ref, dvi_ref,
                k_scr, v_scr, ki_scr, vi_scr, gxn_scr, dki_scr, dvi_scr, *,
                heads: int, num_ip: int, sk_text: int, sk_ip: int,
                eps: float, sm_scale: float, has_ip: bool, has_bias: bool):
    """dx / dki / dvi of the fused cross block. dki/dvi are gradients wrt
    the ip K/V PROJECTIONS (per position); the tiny dwk_ip/dwv_ip einsum
    over them runs in XLA (_bwd). Text-branch k/v and all frozen weight
    grads are never computed here."""

    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    cq = wq_ref.shape[-1]  # heads * (padded) head dim
    d = cq // heads

    lns = lns_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        ctx = ctx_ref[0]
        text = ctx[:k_scr.shape[0], :]
        k_scr[:, :] = jax.lax.dot_general(
            text, wk_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(k_scr.dtype)
        v_scr[:, :] = jax.lax.dot_general(
            text, wv_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(v_scr.dtype)
        if has_ip:
            ip = jax.lax.slice_in_dim(ctx, num_ip, num_ip + ki_scr.shape[0], axis=0)
            ki_scr[:, :] = jax.lax.dot_general(
                ip, wki_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(ki_scr.dtype)
            vi_scr[:, :] = jax.lax.dot_general(
                ip, wvi_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(vi_scr.dtype)
        gxn_scr[:, :] = jnp.zeros_like(gxn_scr)
        dki_scr[:, :] = jnp.zeros_like(dki_scr)
        dvi_scr[:, :] = jnp.zeros_like(dvi_scr)

    xt = x_tile_ref[0]
    gt = g_tile_ref[0]
    tq = xt.shape[0]
    xn = _ln(xt, lns, lnb, eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)
    gattn = jax.lax.dot_general(
        gt, wo_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(xt.dtype)

    bias_row = bias_ref[0].astype(jnp.float32) if has_bias else None
    dq, _, _ = _staircase_attention_bwd(
        q, gattn, k_scr[:, :], v_scr[:, :], bias_row, sk_text, heads, d,
        want_dkv=False)
    if has_ip:
        gattn_ip = (gattn.astype(jnp.float32)
                    * scale_ref[0, 0]).astype(xt.dtype)
        dq_ip, dki_t, dvi_t = _staircase_attention_bwd(
            q, gattn_ip, ki_scr[:, :], vi_scr[:, :], None, sk_ip, heads, d,
            want_dkv=True)
        dq = dq + dq_ip
        dki_scr[:, :] += dki_t
        dvi_scr[:, :] += dvi_t

    gxn_scr[pl.ds(j * tq, tq), :] += jax.lax.dot_general(
        (dq * sm_scale).astype(xt.dtype), wq_ref[:, :],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == n_tiles - 1)
    def _():
        xf = x_full_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        nhat = xc * rstd
        gn = gxn_scr[:, :] * lns
        m1 = jnp.mean(gn, axis=-1, keepdims=True)
        m2 = jnp.mean(gn * nhat, axis=-1, keepdims=True)
        dx = rstd * (gn - m1 - nhat * m2) + g_full_ref[0].astype(jnp.float32)
        dx_ref[0] = dx.astype(dx_ref.dtype)
        dki_ref[0] = dki_scr[:, :].astype(dki_ref.dtype)
        dvi_ref[0] = dvi_scr[:, :].astype(dvi_ref.dtype)


def fused_ln_cross_attention_bwd(
    x: jnp.ndarray, grad: jnp.ndarray, context: jnp.ndarray,
    ln_scale, ln_bias, wq, wk, wv, wo,
    heads: int, *,
    wk_ip=None, wv_ip=None, ip_scale=0.0, num_ip_tokens: int = 8,
    mask_bias=None, eps: float = 1e-5, tile_q: int = 256,
    interpret: bool = False,
):
    """-> (dx [B,S,C], dki [B,Sk_ip,C], dvi [B,Sk_ip,C]).

    dki/dvi are zeros-shaped [B, 0, C] slices when there is no adapter
    branch."""

    b, s, c = x.shape
    d_in = c // heads
    d_p = _pad_head_dim(d_in)
    assert d_p is not None and fused_block_applicable(heads, d_in) and c % LANES == 0
    cq = heads * d_p
    has_ip = wk_ip is not None
    sk_total = context.shape[1]
    if has_ip:
        sk_text, sk_ip = num_ip_tokens, sk_total - num_ip_tokens
    else:
        sk_text, sk_ip = sk_total, 0

    tile_q = pick_tile_q(s, min(tile_q, _round_up(s, 64)))
    sp = _round_up(s, tile_q)
    skp_text = _round_up(max(sk_text, 8), 8)
    skp_ip = _round_up(max(sk_ip, 8), 8)
    skp_total = _round_up(sk_total, 8)

    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    gp = jnp.pad(cast(grad), ((0, 0), (0, sp - s), (0, 0)))
    ctxp = jnp.pad(cast(context), ((0, 0), (0, skp_total - sk_total), (0, 0)))
    dc = context.shape[-1]

    if mask_bias is None:
        bias = jnp.zeros((b, 1, skp_text), jnp.float32)
        has_bias = False
    else:
        bias = jnp.pad(mask_bias.astype(jnp.float32),
                       ((0, 0), (0, skp_text - mask_bias.shape[1])))[:, None, :]
        has_bias = True

    zeros_w = jnp.zeros((dc, c), dt)
    wki = cast(wk_ip) if has_ip else zeros_w
    wvi = cast(wv_ip) if has_ip else zeros_w
    if d_p != d_in:
        wq = _pad_heads_in(cast(wq), heads, d_in, d_p)
        wk = _pad_heads_in(cast(wk), heads, d_in, d_p)
        wv = _pad_heads_in(cast(wv), heads, d_in, d_p)
        wki = _pad_heads_in(wki, heads, d_in, d_p)
        wvi = _pad_heads_in(wvi, heads, d_in, d_p)
        wo = _pad_heads_out(cast(wo), heads, d_in, d_p)

    full = pl.BlockSpec((1, sp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    ipb = pl.BlockSpec((1, skp_ip, cq), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    dx, dki, dvi = pl.pallas_call(
        functools.partial(
            _bwd_kernel, heads=heads, num_ip=num_ip_tokens, sk_text=sk_text,
            sk_ip=sk_ip, eps=eps, sm_scale=float(d_in) ** -0.5,
            has_ip=has_ip, has_bias=has_bias),
        grid=(b, sp // tile_q),
        in_specs=[
            full, full, tile, tile,
            pl.BlockSpec((1, skp_total, dc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skp_text), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            vec, vec,
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[full, ipb, ipb],
        out_shape=[
            jax.ShapeDtypeStruct((b, sp, c), grad.dtype),
            jax.ShapeDtypeStruct((b, skp_ip, cq), jnp.float32),
            jax.ShapeDtypeStruct((b, skp_ip, cq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((skp_text, cq), dt),
            pltpu.VMEM((skp_text, cq), dt),
            pltpu.VMEM((skp_ip, cq), dt),
            pltpu.VMEM((skp_ip, cq), dt),
            pltpu.VMEM((sp, c), jnp.float32),
            pltpu.VMEM((skp_ip, cq), jnp.float32),
            pltpu.VMEM((skp_ip, cq), jnp.float32),
        ],
        interpret=interpret,
    )(xp, gp, xp, gp, ctxp, bias, cast(ln_scale).reshape(1, c),
      cast(ln_bias).reshape(1, c), cast(wq), cast(wk), cast(wv), wki, wvi,
      cast(wo), jnp.asarray(ip_scale, jnp.float32).reshape(1, 1))
    # ip-projection grads come out in padded-head layout — drop the (exactly
    # zero) pad lanes before the XLA weight-grad einsum
    dki = _unpad_heads(dki[:, :sk_ip], heads, d_in, d_p)
    dvi = _unpad_heads(dvi[:, :sk_ip], heads, d_in, d_p)
    return dx[:, :s], dki, dvi


def _xla_reference(x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads,
                   wk_ip, wv_ip, ip_scale, num_ip_tokens, mask_bias, eps):
    b, s, c = x.shape
    d = c // heads
    xn = _ln(x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32), eps).astype(x.dtype)
    has_ip = wk_ip is not None
    ctx_t = context[:, :num_ip_tokens] if has_ip else context
    q = (xn @ wq).reshape(b, s, heads, d)

    def attn(ctx, wk_, wv_, bias):
        k = (ctx @ wk_).reshape(b, -1, heads, d)
        v = (ctx @ wv_).reshape(b, -1, heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (float(d) ** -0.5)
        if bias is not None:
            logits = logits + bias[:, None, None, :].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)

    out = attn(ctx_t, wk, wv, mask_bias)
    if has_ip:
        out = out + jnp.asarray(ip_scale, out.dtype) * attn(
            context[:, num_ip_tokens:], wk_ip, wv_ip, None)
    return x + (out @ wo + bo).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 13, 15))
def fused_ln_cross_attention_vjp(x, context, ln_scale, ln_bias, wq, wk, wv,
                                 wo, bo, heads, wk_ip, wv_ip, ip_scale,
                                 num_ip_tokens, mask_bias, eps):
    return fused_ln_cross_attention(
        x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads,
        wk_ip=wk_ip, wv_ip=wv_ip, ip_scale=ip_scale,
        num_ip_tokens=num_ip_tokens, mask_bias=mask_bias, eps=eps)


def _fwd(x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads,
         wk_ip, wv_ip, ip_scale, num_ip_tokens, mask_bias, eps):
    out = fused_ln_cross_attention(
        x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads,
        wk_ip=wk_ip, wv_ip=wv_ip, ip_scale=ip_scale,
        num_ip_tokens=num_ip_tokens, mask_bias=mask_bias, eps=eps)
    return out, (x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                 wk_ip, wv_ip, ip_scale, mask_bias)


def _bwd(heads, num_ip_tokens, eps, res, grad):
    (x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo,
     wk_ip, wv_ip, ip_scale, mask_bias) = res
    if wk_ip is None:
        def f(x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo, ip_scale):
            return _xla_reference(x, context, ln_scale, ln_bias, wq, wk, wv,
                                  wo, bo, heads, None, None, ip_scale,
                                  num_ip_tokens, mask_bias, eps)
        _, vjp = jax.vjp(f, x, context, ln_scale, ln_bias, wq, wk, wv, wo,
                         bo, ip_scale)
        dx, dctx, dls, dlb, dwq, dwk, dwv, dwo, dbo, dscale = vjp(grad)
        from ap_adapter_tpu.ops.attention import _on_tpu

        if _on_tpu():
            dx, _, _ = fused_ln_cross_attention_bwd(
                x, grad, context, ln_scale, ln_bias, wq, wk, wv, wo, heads,
                num_ip_tokens=num_ip_tokens, mask_bias=mask_bias, eps=eps)
        dmask = None if mask_bias is None else jnp.zeros_like(mask_bias)
        return (dx, dctx, dls, dlb, dwq, dwk, dwv, dwo, dbo,
                None, None, dscale, dmask)

    def f(x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo, wk_ip, wv_ip, ip_scale):
        return _xla_reference(x, context, ln_scale, ln_bias, wq, wk, wv, wo,
                              bo, heads, wk_ip, wv_ip, ip_scale,
                              num_ip_tokens, mask_bias, eps)
    _, vjp = jax.vjp(f, x, context, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                     wk_ip, wv_ip, ip_scale)
    dx, dctx, dls, dlb, dwq, dwk, dwv, dwo, dbo, dwki, dwvi, dscale = vjp(grad)
    from ap_adapter_tpu.ops.attention import _on_tpu

    if _on_tpu():
        # dx + the ADAPTER grads from the fused bwd kernel (to_k_ip/to_v_ip
        # are the trained parameters — these cannot be left to the slow
        # path); all frozen-weight grads above remain XLA expressions that
        # DCE away in adapter-only training.
        dx, dki, dvi = fused_ln_cross_attention_bwd(
            x, grad, context, ln_scale, ln_bias, wq, wk, wv, wo, heads,
            wk_ip=wk_ip, wv_ip=wv_ip, ip_scale=ip_scale,
            num_ip_tokens=num_ip_tokens, mask_bias=mask_bias, eps=eps)
        ip_ctx = context[:, num_ip_tokens:]
        dwki = jnp.einsum("bkd,bkc->dc", ip_ctx, dki.astype(ip_ctx.dtype),
                          preferred_element_type=jnp.float32).astype(wk_ip.dtype)
        dwvi = jnp.einsum("bkd,bkc->dc", ip_ctx, dvi.astype(ip_ctx.dtype),
                          preferred_element_type=jnp.float32).astype(wv_ip.dtype)
    dmask = None if mask_bias is None else jnp.zeros_like(mask_bias)
    return (dx, dctx, dls, dlb, dwq, dwk, dwv, dwo, dbo, dwki, dwvi,
            dscale, dmask)


fused_ln_cross_attention_vjp.defvjp(_fwd, _bwd)
