"""int8 (W8A8) serving variants of the fused transformer-block kernels.

Serving-only quantized inference for the UNet hot path (reference serves
fp16, inference.py:13; this is the TPU analogue one step further down the
precision ladder — v5e's MXU runs int8 at 2x the bf16 rate). Weights are
quantized symmetrically per output channel; activations dynamically per
row inside the kernel, so no calibration pass is needed.

What is quantized and what is NOT:

* feed-forward (GEGLU): both matmuls int8 x int8 -> int32. Per-row
  activation scales compose exactly with per-column weight scales, and the
  GELU/gating runs in fp32 between them.
* self-attention: the q/k/v/out PROJECTIONS and the S^2 QK product are
  int8. K is centered per lane before quantization — softmax is invariant
  to a per-query-row constant, so subtracting the per-lane key mean costs
  nothing numerically and absorbs the lane-mean dynamic range that would
  otherwise eat int8 precision (the same observation SageAttention makes
  for CUDA int8 attention). The per-lane K requant scales are folded into
  Q before ITS per-row quantization, so the int32 logits dequantize with a
  single per-row factor.
* the PV product stays bf16. Softmax probabilities span [~1e-6, 1] — an
  int8 grid with per-row max 1.0 zeroes every probability below 1/254,
  which for diffuse attention rows (the norm at S=1000) deletes most of
  the numerator mass. fp8 (e4m3) would carry the range, but v5e has no
  fp8 MXU mode worth routing to; bf16 PV keeps the error in the same
  class as the rest of the network.

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
from ap_adapter_tpu.ops.pallas_fused_ff import _erf


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] -> (int8 [in, out], fp32 scale [1, out]).

    Symmetric per-output-channel. Runs in-graph right before the kernel
    call — the ops are loop-invariant inside the DDIM scan, so XLA's
    while-loop LICM can hoist them out of the denoise loop (cost measured
    in the A/B bench either way; see docs/PERF.md).
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
    w1: jnp.ndarray,        # [C, 2*inner]
    b1: jnp.ndarray,
    w2: jnp.ndarray,        # [inner, C]
    b2: jnp.ndarray,
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + W2·geglu(LN(x)W1 + b1) with int8 W8A8 matmuls (serving mode)."""

    b, s, c = x.shape
    inner = w2.shape[0]
    assert w1.shape == (c, 2 * inner) and inner % 128 == 0 and c % 128 == 0
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
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
      w1q, s1, f32(b1).reshape(1, 2 * inner), w2q, s2, f32(b2).reshape(1, c))
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
# fused LN + self-attention block, int8 projections + int8 QK
# ---------------------------------------------------------------------------


def _attn_kernel_i8(x_full_ref, x_tile_ref, lns_ref, lnb_ref, wq_ref, sq_ref,
                    wk_ref, sk_ref, wv_ref, sv_ref, wo_ref, so_ref, bo_ref,
                    o_ref, k8_scr, klane_scr, v_scr, *,
                    heads: int, s_valid: int, eps: float, sm_scale: float):
    j = pl.program_id(1)
    c = x_tile_ref.shape[-1]   # LN/residual width
    cq = wq_ref.shape[-1]      # q/k/v width = heads * (padded) head dim
    d = cq // heads
    g = LANES // d             # heads per 128-lane group
    n_groups = cq // LANES
    tq = x_tile_ref.shape[1]
    sp = k8_scr.shape[0]

    lns = lns_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        xf = _ln(x_full_ref[0], lns, lnb, eps)
        x8, sx = _quant_rows(xf)
        k = (_dot_i8(x8, wk_ref[:, :]).astype(jnp.float32)
             * sx * sk_ref[0])                       # fp32 [Sp, cq]
        v = (_dot_i8(x8, wv_ref[:, :]).astype(jnp.float32)
             * sx * sv_ref[0])
        # center K per lane: logits shift by a per-query-row constant only
        # (softmax-invariant) and the lane means stop eating int8 range.
        # Pad rows (>= s_valid) are masked out of the mean AND the logits.
        row = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        valid = row < s_valid
        kz = jnp.where(valid, k, 0.0)
        kmean = jnp.sum(kz, axis=0, keepdims=True) * (1.0 / s_valid)
        kc = jnp.where(valid, k - kmean, 0.0)
        # per-lane requant scale, saved for the Q-side fold
        klane = jnp.maximum(jnp.max(jnp.abs(kc), axis=0, keepdims=True),
                            1e-8) * (1.0 / 127.0)    # [1, cq]
        k8_scr[:, :] = jnp.round(kc * (1.0 / klane)).astype(jnp.int8)
        klane_scr[0:1, :] = klane
        v_scr[:, :] = v.astype(v_scr.dtype)

    xt = x_tile_ref[0]
    xn = _ln(xt, lns, lnb, eps)
    xn8, sxn = _quant_rows(xn)
    q = (_dot_i8(xn8, wq_ref[:, :]).astype(jnp.float32)
         * sxn * sq_ref[0] * sm_scale)               # fp32 [tq, cq]
    # fold the per-lane K scales into Q so the int32 logits dequantize with
    # one per-row factor: logits = (q8 @ k8^T) * srow
    qk = q * klane_scr[0:1, :]

    attn_groups = []
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    for g2 in range(n_groups):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg = qk[:, sl]                      # fp32 [tq, 128] — g packed heads
        q8, srow = _quant_rows(qg)          # int8 + [tq, 1]
        q8s = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), q8, 0)
             for i in range(g)], axis=0)    # [g*tq, 128] staircase (int8)
        srows = jnp.concatenate([srow] * g, axis=0)  # [g*tq, 1]
        logits = jax.lax.dot_general(
            q8s, k8_scr[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * srows
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < s_valid, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        vg = v_scr[:, sl]
        o_full = jax.lax.dot_general(
            p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom  # [g*tq, 128] bf16 PV
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
    wq: jnp.ndarray,        # [C, C]
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,        # [C]
    heads: int,
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + OutProj(MHA(LN(x))) with int8 projections + int8 QK (serving).

    Same applicability contract as fused_ln_self_attention (head dims that
    don't divide 128 run at the padded width folded into the weights — the
    zero pad lanes quantize to zero exactly).
    """

    b, s, c = x.shape
    d_in = c // heads
    d = _pad_head_dim(d_in)
    assert d is not None and fused_block_applicable(heads, d_in) and c % LANES == 0
    cq = heads * d
    if d != d_in:
        wq = _pad_heads_in(wq, heads, d_in, d)
        wk = _pad_heads_in(wk, heads, d_in, d)
        wv = _pad_heads_in(wv, heads, d_in, d)
        wo = _pad_heads_out(wo, heads, d_in, d)
    wq8, sq = quantize_weight(wq)
    wk8, sk = quantize_weight(wk)
    wv8, sv = quantize_weight(wv)
    wo8, so = quantize_weight(wo)
    tile_q = pick_tile_q(s, tile_q)
    sp = _round_up(s, tile_q)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    vec_c = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    vec_cq = pl.BlockSpec((1, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    mat_in = pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    mat_out = pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_kernel_i8, heads=heads, s_valid=s, eps=eps,
                          sm_scale=float(d_in) ** -0.5),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, sp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            vec_c, vec_c,
            mat_in, vec_cq,   # wq8, scale
            mat_in, vec_cq,   # wk8, scale
            mat_in, vec_cq,   # wv8, scale
            mat_out, vec_c,   # wo8, scale
            vec_c,            # bo
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        scratch_shapes=[
            pltpu.VMEM((sp, cq), jnp.int8),      # centered K, int8
            pltpu.VMEM((8, cq), jnp.float32),    # per-lane K scales (row 0)
            pltpu.VMEM((sp, cq), dt),            # V (bf16 PV)
        ],
        interpret=interpret,
    )(xp, xp, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      wq8, sq, wk8, sk, wv8, sv, wo8, so,
      jnp.asarray(bo, jnp.float32).reshape(1, c))
    return out[:, :s]
