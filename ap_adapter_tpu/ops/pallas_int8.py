"""int8 (W8A8) serving variants of the fused transformer-block kernels.

Serving-only quantized inference for the UNet hot path (reference serves
fp16, inference.py:13; this is the TPU analogue one step further down the
precision ladder). Weights are quantized symmetrically per output channel
ONCE at pipeline build (the Flax "quant" collection — see
models/unet_blocks.py); activations dynamically per row inside the kernel,
so no calibration pass is needed.

What is quantized and what is NOT — every choice below is measured, not
assumed (ratios from a chained-matmul Pallas probe at the exact kernel
shapes; in-pipeline deltas in docs/PERF.md):

* QUANTIZED — matmuls with tile-sized M (<=256 rows) and K >= 256:
  the feed-forward pair ([tq,256]x[256,2048]: int8 1.32x, [tq,1024]x
  [1024,256]: 1.38x) and the per-tile q / out projections of both
  attention kernels.
* NOT quantized — the S^2 attention products and the whole-sequence K/V
  projections. int8 at the QK shape ([g*tq,128]x[128,Sp], K=128) measured
  0.89x — SLOWER than bf16: the MXU's int8 rate needs deep contractions
  to amortize (4096-deep probe: 1.8x), and K=128 has nothing to amortize.
  The M=1000 K/V projections measured 0.91x. PV additionally has a range
  problem: softmax probabilities span [~1e-6, 1], and an int8 grid with
  per-row max 1.0 zeroes everything below 1/254 — for diffuse attention
  rows (the norm at S=1000) that deletes most of the numerator mass.

A first iteration that also quantized QK (plus per-step in-graph weight
requantization, which XLA's while-LICM does NOT hoist out of the DDIM
scan — verified on the lowered HLO) measured 2.07 vs 2.17 clips/s at
batch 24: the losing-shape matmuls and ~20 ms/step of requant ops+gaps
ate the projection wins. This version keeps only the winning shapes and
moves weight quantization out of the step entirely.

Opt-in: UNetConfig.use_int8 (bench A/B hook AP_INT8=1). Inference-only —
the kernels define no VJP; the trainer never sets the flag.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ap_adapter_tpu.ops.pallas_fused_block import (
    LANES,
    NEG_INF,
    _ln,
    _pad_head_dim,
    _pad_heads_in,
    _pad_heads_out,
    _round_up,
    fused_block_applicable,
    pick_tile_q,
)
from ap_adapter_tpu.ops.pallas_fused_cross import _staircase_attention
from ap_adapter_tpu.ops.pallas_fused_ff import _erf


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] -> (int8 [in, out], fp32 scale [1, out]).

    Symmetric per-output-channel. Called once per weight at pipeline build
    (via the "quant" variable collection), NOT in the step graph: XLA's
    while-loop LICM does not hoist the round/reduce out of the DDIM scan
    (verified on the lowered HLO), so in-graph quantization costs a full
    requant pass every denoise step.
    """

    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.round(wf / scale).astype(jnp.int8)
    return w8, scale


def _quant_rows(x32: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 [r, c] -> (int8 [r, c], fp32 per-row scale [r, 1])."""

    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.round(x32 * (1.0 / scale)).astype(jnp.int8)
    return q, scale


def _dot_i8(a8, b8):
    return jax.lax.dot_general(
        a8, b8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


# ---------------------------------------------------------------------------
# fused LN + GEGLU feed-forward, int8 matmuls
# ---------------------------------------------------------------------------


def _ff_kernel_i8(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                  s2_ref, b2_ref, o_ref, *, inner: int, eps: float):
    xt = x_ref[0]  # [tq, C]
    xn = _ln(xt, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32),
             eps)                                   # fp32 [tq, C]
    x8, sx = _quant_rows(xn)
    h = (_dot_i8(x8, w1_ref[:, :]).astype(jnp.float32)
         * sx * s1_ref[0]                            # [tq,1] x [1,2F]
         + b1_ref[0].astype(jnp.float32))            # [tq, 2*inner]
    a = jax.lax.slice_in_dim(h, 0, inner, axis=1)
    g = jax.lax.slice_in_dim(h, inner, 2 * inner, axis=1)
    y = a * g * 0.5 * (1.0 + _erf(g * (2.0 ** -0.5)))  # fp32 [tq, inner]
    y8, sy = _quant_rows(y)
    out = (_dot_i8(y8, w2_ref[:, :]).astype(jnp.float32)
           * sy * s2_ref[0]
           + b2_ref[0].astype(jnp.float32))
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


def fused_ln_geglu_ff_int8(
    x: jnp.ndarray,         # [B, S, C]
    ln_scale: jnp.ndarray,  # [C]
    ln_bias: jnp.ndarray,
    w1q: jnp.ndarray,       # int8 [C, 2*inner]  (quantize_weight output)
    s1: jnp.ndarray,        # fp32 [1, 2*inner]
    b1: jnp.ndarray,
    w2q: jnp.ndarray,       # int8 [inner, C]
    s2: jnp.ndarray,        # fp32 [1, C]
    b2: jnp.ndarray,
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + W2·geglu(LN(x)W1 + b1) with int8 W8A8 matmuls (serving mode).

    Weights arrive pre-quantized (quantize_weight) — callers quantize once
    outside the step graph."""

    b, s, c = x.shape
    inner = w2q.shape[0]
    assert w1q.shape == (c, 2 * inner) and inner % 128 == 0 and c % 128 == 0
    assert w1q.dtype == jnp.int8 and w2q.dtype == jnp.int8
    tile_q = pick_tile_q(s, min(tile_q, _round_up(s, 64)))
    sp = _round_up(s, tile_q)
    x_in = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0))) if sp != s else x
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    out = pl.pallas_call(
        functools.partial(_ff_kernel_i8, inner=inner, eps=eps),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        interpret=interpret,
    )(x_in, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      w1q, f32(s1).reshape(1, 2 * inner), f32(b1).reshape(1, 2 * inner),
      w2q, f32(s2).reshape(1, c), f32(b2).reshape(1, c))
    return out[:, :s]


def ff_int8_tile_q(s: int, c: int, inner: int) -> int:
    """Largest tile within ~12 MB VMEM (int8 weights halve the fixed cost
    vs the bf16 kernel; fp32 h/y activation tiles dominate)."""

    w_bytes = (c * 2 * inner + inner * c) * 1 + (2 * inner + c) * 4
    for tq in (256, 128, 64):
        act = tq * (2 * inner * 4 + inner * 4 + 2 * c * 4 + 2 * inner + c)
        if w_bytes + act <= 12 * 1024 * 1024:
            return tq
    return 0


# ---------------------------------------------------------------------------
# fused LN + self-attention block, int8 q / out projections
# ---------------------------------------------------------------------------


def _attn_kernel_i8(x_full_ref, x_tile_ref, lns_ref, lnb_ref, wq_ref, sq_ref,
                    wk_ref, wv_ref, wo_ref, so_ref, bo_ref,
                    o_ref, k_scr, v_scr, *,
                    heads: int, s_valid: int, eps: float, sm_scale: float):
    """Same staircase attention as pallas_fused_block._kernel, with the two
    per-tile [tq, C]-row projections (q, out) in int8. K/V projections
    (M = whole sequence) and the S^2 QK/PV products stay bf16 — the losing
    int8 shapes (module docstring)."""

    j = pl.program_id(1)
    c = x_tile_ref.shape[-1]   # LN/residual width
    cq = wq_ref.shape[-1]      # q/k/v width = heads * (padded) head dim
    d = cq // heads
    g = LANES // d
    n_groups = cq // LANES
    tq = x_tile_ref.shape[1]

    lns = lns_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        xf = _ln(x_full_ref[0], lns, lnb, eps).astype(x_full_ref.dtype)
        k_scr[:, :] = jax.lax.dot_general(
            xf, wk_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(k_scr.dtype)
        v_scr[:, :] = jax.lax.dot_general(
            xf, wv_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(v_scr.dtype)

    xt = x_tile_ref[0]
    xn = _ln(xt, lns, lnb, eps)
    xn8, sxn = _quant_rows(xn)
    q = ((_dot_i8(xn8, wq_ref[:, :]).astype(jnp.float32)
          * sxn * sq_ref[0]) * sm_scale).astype(xt.dtype)  # [tq, cq]

    attn_groups = []
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    for g2 in range(n_groups):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg = q[:, sl]
        kg = k_scr[:, sl]
        vg = v_scr[:, sl]
        qs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), qg, 0)
             for i in range(g)], axis=0)    # [g*tq, 128] staircase
        logits = jax.lax.dot_general(
            qs, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if s_valid < k_scr.shape[0]:  # static: mask only when S was padded
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < s_valid, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o_full = jax.lax.dot_general(
            p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom  # [g*tq, 128]
        og = jnp.zeros((tq, LANES), jnp.float32)
        for i in range(g):
            blk = jax.lax.slice_in_dim(o_full, i * tq, (i + 1) * tq, axis=0)
            og = og + jnp.where((lane >= i * d) & (lane < (i + 1) * d), blk, 0)
        attn_groups.append(og)

    attn = jnp.concatenate(attn_groups, axis=1)      # fp32 [tq, cq]
    a8, sa = _quant_rows(attn)
    out = (_dot_i8(a8, wo_ref[:, :]).astype(jnp.float32)
           * sa * so_ref[0]
           + bo_ref[0].astype(jnp.float32))
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


def fused_ln_self_attention_int8(
    x: jnp.ndarray,         # [B, S, C]
    ln_scale: jnp.ndarray,  # [C]
    ln_bias: jnp.ndarray,
    wq8: jnp.ndarray,       # int8 [C, cq] (padded-head layout, quantized)
    sq: jnp.ndarray,        # fp32 [1, cq]
    wk: jnp.ndarray,        # [C, cq] fp (padded-head layout)
    wv: jnp.ndarray,
    wo8: jnp.ndarray,       # int8 [cq, C]
    so: jnp.ndarray,        # fp32 [1, C]
    bo: jnp.ndarray,        # [C]
    heads: int,
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + OutProj(MHA(LN(x))) with int8 q/out projections (serving).

    Weights arrive pre-quantized AND pre-padded to the internal head width
    (quantize_attention_weights below builds all five arrays)."""

    b, s, c = x.shape
    d_in = c // heads
    d = _pad_head_dim(d_in)
    assert d is not None and fused_block_applicable(heads, d_in) and c % LANES == 0
    cq = heads * d
    assert wq8.shape == (c, cq) and wq8.dtype == jnp.int8
    tile_q = pick_tile_q(s, tile_q)
    sp = _round_up(s, tile_q)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    out = pl.pallas_call(
        functools.partial(_attn_kernel_i8, heads=heads, s_valid=s, eps=eps,
                          sm_scale=float(d_in) ** -0.5),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, sp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        scratch_shapes=[
            pltpu.VMEM((sp, cq), dt),
            pltpu.VMEM((sp, cq), dt),
        ],
        interpret=interpret,
    )(xp, xp, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      wq8, jnp.asarray(sq, jnp.float32).reshape(1, cq), cast(wk), cast(wv),
      wo8, jnp.asarray(so, jnp.float32).reshape(1, c),
      jnp.asarray(bo, jnp.float32).reshape(1, c))
    return out[:, :s]


def quantize_attention_weights(wq, wk, wv, wo, heads: int, kv_dtype=None):
    """Pad heads to the kernel's internal width, then quantize q/out.

    -> (wq8, sq, wk_padded, wv_padded, wo8, so) — exactly the weight
    arguments of fused_ln_self_attention_int8 / the cross variant.
    ``kv_dtype``: storage dtype for the (unquantized) k/v weights — pass
    the compute dtype so the step graph reads them without a per-step
    convert (they live in the "quant" collection alongside the int8
    copies)."""

    # head dim from the projection output width (cross included: wq is
    # [C, inner] with inner == heads * d_in)
    d_in = wq.shape[1] // heads
    d_p = _pad_head_dim(d_in)
    if d_p != d_in:
        wq = _pad_heads_in(wq, heads, d_in, d_p)
        wk = _pad_heads_in(wk, heads, d_in, d_p)
        wv = _pad_heads_in(wv, heads, d_in, d_p)
        wo = _pad_heads_out(wo, heads, d_in, d_p)
    wq8, sq = quantize_weight(wq)
    wo8, so = quantize_weight(wo)
    if kv_dtype is not None:
        wk = jnp.asarray(wk, kv_dtype)
        wv = jnp.asarray(wv, kv_dtype)
    return wq8, sq, wk, wv, wo8, so


# ---------------------------------------------------------------------------
# fused LN + cross-attention block, int8 q/out projections
# ---------------------------------------------------------------------------


def _cross_kernel_i8(x_tile_ref, ctx_ref, bias_ref, lns_ref, lnb_ref, wq_ref,
                     sq_ref, wk_ref, wv_ref, wki_ref, wvi_ref, wo_ref, so_ref,
                     bo_ref, scale_ref, o_ref, k_scr, v_scr, ki_scr, vi_scr, *,
                     heads: int, num_ip: int, sk_text: int, sk_ip: int,
                     eps: float, sm_scale: float, has_ip: bool,
                     has_bias: bool):
    """Cross-attention with the two [S, C]-sized projections (q, out) in
    int8. Contexts are <=~136 rows, so the k/v projections and the QK/PV
    products are left bf16 — they are noise next to the q/out matmuls, and
    skipping them keeps the scale plumbing (and quant error) minimal."""

    j = pl.program_id(1)
    cq = wq_ref.shape[-1]
    d = cq // heads

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

    xt = x_tile_ref[0]
    xn = _ln(xt, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32), eps)
    xn8, sxn = _quant_rows(xn)
    q = (_dot_i8(xn8, wq_ref[:, :]).astype(jnp.float32)
         * sxn * sq_ref[0] * sm_scale).astype(xt.dtype)

    bias_row = bias_ref[0].astype(jnp.float32) if has_bias else None
    out = _staircase_attention(q, k_scr[:, :], v_scr[:, :], bias_row,
                               sk_text, heads, d)
    if has_ip:
        out_ip = _staircase_attention(q, ki_scr[:, :], vi_scr[:, :], None,
                                      sk_ip, heads, d)
        out = out + scale_ref[0, 0] * out_ip

    a8, sa = _quant_rows(out)
    proj = (_dot_i8(a8, wo_ref[:, :]).astype(jnp.float32)
            * sa * so_ref[0]
            + bo_ref[0].astype(jnp.float32))
    o_ref[0] = (xt.astype(jnp.float32) + proj).astype(o_ref.dtype)


def fused_ln_cross_attention_int8(
    x: jnp.ndarray,          # [B, S, C]
    context: jnp.ndarray,    # [B, Sk, Dc]
    ln_scale, ln_bias,       # [C]
    wq8, sq,                 # int8 [C, cq] + fp32 [1, cq] (pre-quantized)
    wk, wv,                  # [Dc, cq] fp (pre-padded)
    wo8, so,                 # int8 [cq, C] + fp32 [1, C]
    bo,                      # [C]
    heads: int,
    *,
    wk_ip=None, wv_ip=None,  # [Dc, cq] fp (adapter sites, pre-padded)
    ip_scale=0.0,
    num_ip_tokens: int = 8,
    mask_bias: Optional[jnp.ndarray] = None,  # [B, Sk] additive (text part)
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-mode twin of fused_ln_cross_attention (same contract);
    weights arrive from quantize_attention_weights."""

    b, s, c = x.shape
    d_in = c // heads
    d_p = _pad_head_dim(d_in)
    assert d_p is not None and fused_block_applicable(heads, d_in) and c % LANES == 0
    cq = heads * d_p
    assert wq8.shape == (c, cq) and wq8.dtype == jnp.int8
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

    zeros_w = jnp.zeros((dc, cq), dt)
    wki = cast(wk_ip) if has_ip else zeros_w
    wvi = cast(wv_ip) if has_ip else zeros_w

    out = pl.pallas_call(
        functools.partial(
            _cross_kernel_i8, heads=heads, num_ip=num_ip_tokens,
            sk_text=sk_text, sk_ip=sk_ip, eps=eps,
            sm_scale=float(d_in) ** -0.5, has_ip=has_ip, has_bias=has_bias,
        ),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp_total, dc), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skp_text), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
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
      wq8, jnp.asarray(sq, jnp.float32).reshape(1, cq), cast(wk), cast(wv),
      wki, wvi, wo8, jnp.asarray(so, jnp.float32).reshape(1, c),
      jnp.asarray(bo, jnp.float32).reshape(1, c),
      jnp.asarray(ip_scale, jnp.float32).reshape(1, 1))
    return out[:, :s]
