"""Fully-fused pre-LN self-attention block kernel.

One Pallas kernel computes ``x + Wo @ MHA(LN(x) Wq, LN(x) Wk, LN(x) Wv)``
for the UNet's hot self-attention sites (S=1000, C=256, 8 heads of dim 32 —
reference modeling_audioldm2.py Transformer2DModel attn1 and the
double_self_attention attn2, x60 per denoise step).

Why fuse: the r1.5 trace shows the standalone attention kernel at
0.41 ms/site while LayerNorm statistics (``convert_reduce_fusion``),
q/k/v/out materialization and residual adds contribute a comparable amount
of HBM glue around it. Here q, k, v and the attention output never touch
HBM: per grid row the kernel reads x once (plus the [C,C] weights), holds
K/V projections in VMEM scratch across query tiles, and writes the
residual-added output once.

Layout facts the kernel exploits:
* ``LN(x) @ Wq`` already lays heads contiguously in lanes ([*, (head, d)])
  — the head-packed attention layout is free, no transposes anywhere.
* Heads are processed in groups of ``128 // head_dim`` over 128-aligned
  lane slices (free in Mosaic) using the staircase-query trick of
  ops/pallas_packed_attention.py.
* Matmul inputs stay bf16 (fp32 accumulation); softmax in fp32; the
  denominator divides the [*, 128] output block, not the [*, S] probs.
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

import os as _os

# bf16 softmax inner pass (opt-in A/B: AP_ATTN_BF16=1) — measured 2.186 vs
# 2.227 clips/s at batch 24: bf16 exp is NOT faster on this VPU (internal
# fp32 transcendental + converts); kept for other backends/shapes
_BF16_SOFTMAX = _os.environ.get("AP_ATTN_BF16", "0") == "1"

# Clamped max-free softmax (default ON; AP_ATTN_MAXSUB=1 restores the
# classic rowwise-max-subtracted form). The rowwise max exists only for
# overflow safety; an upper CLAMP gives the same guarantee without the
# dedicated read+cross-lane-reduce pass over the [g·tq, Sp] logits block:
#   p = exp(min(logits, 50))         exp(50)=5.2e21; x4096 keys = 2.1e25
#                                    < fp32 max, so the row sum can't inf —
#                                    AND the un-normalized PV accumulation
#                                    sum(p·v) stays finite for any
#                                    max|v| < ~1.6e13 (the division by denom
#                                    happens AFTER the PV matmul, so the
#                                    clamp must bound the accumulation too;
#                                    at the old clamp of 80, |v| > ~1.5 with
#                                    a saturated row could inf the fp32
#                                    accumulator before normalization)
#   denom = sum(p) + 1e-37           0/0 guard; pollutes only when the row
#                                    max is < ~-86.5 (softmax of such a row
#                                    is garbage under either form)
# Masked columns stay NEG_INF -> exp underflows to exactly 0, as before.
# softmax is shift-invariant, so for any logits in (-86, 50) this is the
# max-subtracted result up to fp32 rounding (exp arg-reduction error
# ~|x|·eps ≈ 3e-6 rel at the clamp; bf16 matmul noise is 100x larger).
# Scaled attention logits in these models sit well inside ±30 (|logit| <=
# |q||k|/sqrt(d) with LN'd activations); rows whose max EXCEEDS the clamp
# get near-uniform weight over the clamped keys instead of their exact
# softmax — an already-degenerate regime under either formulation.
_MAXSUB = _os.environ.get("AP_ATTN_MAXSUB", "0") == "1"
_CLAMP = 50.0
_DENOM_EPS = 1e-37


def _softmax_probs(logits, io_dtype):
    """(numerator p, row denom) under the module flags — the ONE softmax
    used by the forward kernels AND the backward recompute, so the bwd
    probabilities bitwise-match the forward under every flag combination
    (ADVICE r4: _kernel_pipe previously hardcoded the max-subtracted form).

    Default: clamped max-free (see the _CLAMP analysis above). With
    AP_ATTN_MAXSUB=1: classic rowwise-max subtraction; AP_ATTN_BF16=1
    additionally runs the exp in bf16 on bf16 inputs (measured negative on
    v5e — kept for A/Bs on other backends)."""

    if not _MAXSUB:
        p = jnp.exp(jnp.minimum(logits, _CLAMP))
        return p, jnp.sum(p, axis=-1, keepdims=True) + _DENOM_EPS
    m = jnp.max(logits, axis=-1, keepdims=True)
    if io_dtype == jnp.bfloat16 and _BF16_SOFTMAX:
        # bf16 exp/sum over the S² probs (~0.4% rel err — same class as the
        # bf16 matmul rounding everywhere else); fp32 parity tests keep the
        # fp32 path. Halves the dominant VPU traffic.
        p = jnp.exp((logits - m).astype(jnp.bfloat16))
        return p, jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return p, jnp.sum(p, axis=-1, keepdims=True)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_head_dim(d: int) -> Optional[int]:
    """Smallest divisor of 128 >= d — the internal head width the staircase
    packing runs at. Heads with d not dividing 128 (the UNet's 48- and
    80-dim levels) are zero-padded to this width BY RESHAPING THE PROJECTION
    WEIGHTS outside the kernel: q/k/v come out of their matmuls already in
    padded-head layout, so the padding costs nothing at runtime (the pad
    lanes of k/v are zero => logits/PV contributions are exact)."""

    for v in (8, 16, 32, 64, 128):
        if v >= d:
            return v
    return None


def fused_block_applicable(heads: int, d: int) -> bool:
    """Whether the staircase kernels support this (heads, head_dim)."""

    d_p = _pad_head_dim(d)
    if d_p is None:
        return False
    return (heads * d_p) % LANES == 0 and heads % (LANES // d_p) == 0


def _pad_heads_in(w: jnp.ndarray, heads: int, d_in: int, d_p: int) -> jnp.ndarray:
    """[C_in, heads*d_in] -> [C_in, heads*d_p], zero columns per head."""

    c_in = w.shape[0]
    w = w.reshape(c_in, heads, d_in)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, d_p - d_in)))
    return w.reshape(c_in, heads * d_p)


def _pad_heads_out(wo: jnp.ndarray, heads: int, d_in: int, d_p: int) -> jnp.ndarray:
    """[heads*d_in, C_out] -> [heads*d_p, C_out], zero rows per head."""

    c_out = wo.shape[-1]
    wo = wo.reshape(heads, d_in, c_out)
    wo = jnp.pad(wo, ((0, 0), (0, d_p - d_in), (0, 0)))
    return wo.reshape(heads * d_p, c_out)


def pick_tile_q(s: int, max_tile: int) -> int:
    """Largest sublane-aligned (8·k) tile <= max_tile that divides s —
    a dividing tile removes the pad-to-sp copy AND the un-pad slice around
    every kernel call (two ~[B,S,C]-sized HBM round trips each; at S=1000
    the default 256 tile pads to 1024). Falls back to max_tile (padding
    path) when s has no 8-aligned divisor in range (e.g. S=252)."""

    if s <= max_tile:
        # short sequences (the 252- and 64-token UNet levels): one tile
        # covering the whole (8-aligned) sequence
        return _round_up(s, 8)
    if s % max_tile == 0 and max_tile % 8 == 0:
        return max_tile
    # only accept a dividing tile down to half the budget — a much smaller
    # tile costs more in per-program overhead than the pad copies save
    for t in range(max_tile - max_tile % 8, max(max_tile // 2 - 1, 7), -8):
        if s % t == 0:
            return t
    return max_tile


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_full_ref, x_tile_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
            wo_ref, bo_ref, o_ref, k_scr, v_scr, *,
            heads: int, s_valid: int, eps: float, sm_scale: float):
    j = pl.program_id(1)
    c = x_tile_ref.shape[-1]   # LN/residual width
    cq = wq_ref.shape[-1]      # q/k/v width = heads * (padded) head dim
    d = cq // heads
    g = LANES // d           # heads per 128-lane group
    n_groups = cq // LANES   # lane groups
    tq = x_tile_ref.shape[1]

    lns = lns_ref[0].astype(jnp.float32)  # [1, C] viewed rows
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
    xn = _ln(xt, lns, lnb, eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)  # [tq, C], heads in lanes

    attn_groups = []
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    for g2 in range(n_groups):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg = q[:, sl]                       # [tq, 128] — g packed heads
        kg = k_scr[:, sl]                   # [Sp, 128]
        vg = v_scr[:, sl]
        qs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), qg, 0)
             for i in range(g)], axis=0)    # [g*tq, 128] staircase
        logits = jax.lax.dot_general(
            qs, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if s_valid < k_scr.shape[0]:  # static: mask only when S was padded
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < s_valid, logits, NEG_INF)
        p, denom = _softmax_probs(logits, xt.dtype)
        o_full = jax.lax.dot_general(
            p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom  # [g*tq, 128]
        og = jnp.zeros((tq, LANES), jnp.float32)
        for i in range(g):
            blk = jax.lax.slice_in_dim(o_full, i * tq, (i + 1) * tq, axis=0)
            og = og + jnp.where((lane >= i * d) & (lane < (i + 1) * d), blk, 0)
        attn_groups.append(og.astype(xt.dtype))

    attn = jnp.concatenate(attn_groups, axis=1)  # [tq, C]
    out = jax.lax.dot_general(
        attn, wo_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


def _kernel_pipe(x_full_ref, x_tile_ref, lns_ref, lnb_ref, wq_ref, wk_ref,
                 wv_ref, wo_ref, bo_ref, o_ref, k_scr, v_scr, *,
                 heads: int, s_valid: int, eps: float, sm_scale: float):
    """Software-pipelined variant of ``_kernel``: phase 1 issues EVERY lane
    group's staircase-QK logits back to back on the MXU; phase 2 runs
    softmax(g) -> PV(g) per group, so in the in-order issue stream each
    group's VPU softmax sits between independent MXU matmuls (the next
    group's PV / the earlier-issued QKs) and the scoreboard can overlap
    them. The baseline serializes QK -> softmax -> PV per group, idling the
    MXU through every softmax pass. Costs one extra live logits block of
    VMEM per additional lane group."""

    j = pl.program_id(1)
    c = x_tile_ref.shape[-1]
    cq = wq_ref.shape[-1]
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
    xn = _ln(xt, lns, lnb, eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    # phase 1: all groups' logits (MXU, independent of any softmax)
    logits_all = []
    for g2 in range(n_groups):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg = q[:, sl]
        qs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), qg, 0)
             for i in range(g)], axis=0)
        logits = jax.lax.dot_general(
            qs, k_scr[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if s_valid < k_scr.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < s_valid, logits, NEG_INF)
        logits_all.append(logits)

    # phase 2: per group softmax (VPU) then PV (MXU); group i's softmax can
    # overlap group i-1's PV, and group 0's softmax overlaps phase-1 QKs
    attn_groups = []
    for g2 in range(n_groups):
        logits = logits_all[g2]
        vg = v_scr[:, g2 * LANES : (g2 + 1) * LANES]
        p, denom = _softmax_probs(logits, xt.dtype)
        o_full = jax.lax.dot_general(
            p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom
        og = jnp.zeros((tq, LANES), jnp.float32)
        for i in range(g):
            blk = jax.lax.slice_in_dim(o_full, i * tq, (i + 1) * tq, axis=0)
            og = og + jnp.where((lane >= i * d) & (lane < (i + 1) * d), blk, 0)
        attn_groups.append(og.astype(xt.dtype))

    attn = jnp.concatenate(attn_groups, axis=1)
    out = jax.lax.dot_general(
        attn, wo_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


def _kernel_t(x_full_ref, x_tile_ref, lns_ref, lnb_ref, wq_ref, wk_ref,
              wv_ref, wo_ref, bo_ref, o_ref, ks_scr, vt_scr, *,
              heads: int, s_valid: int, eps: float, sm_scale: float):
    """Transposed-logits variant: the PV product runs as v_hᵀ·p_hᵀ with every
    output lane useful (the straight form wastes (g-1)/g of the S² PV MXU
    work), and NO per-tile operand transposes — the K staircase and vᵀ are
    built once per batch row in scratch, logits come out pre-transposed
    ([g·Sp, tq]), softmax reduces over sublanes, and only the final
    [C, tq] output block is transposed back."""

    j = pl.program_id(1)
    c = x_tile_ref.shape[-1]
    d = c // heads
    g = LANES // d
    n_groups = c // LANES
    tq = x_tile_ref.shape[1]
    sp = ks_scr.shape[0] // g

    lns = lns_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        xf = _ln(x_full_ref[0], lns, lnb, eps).astype(x_full_ref.dtype)
        k = jax.lax.dot_general(
            xf, wk_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(ks_scr.dtype)
        v = jax.lax.dot_general(
            xf, wv_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(vt_scr.dtype)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (sp, LANES), 1)
        for g2 in range(n_groups):
            sl = slice(g2 * LANES, (g2 + 1) * LANES)
            kg = k[:, sl]
            ks_scr[:, sl] = jnp.concatenate(
                [jnp.where((lane_k >= i * d) & (lane_k < (i + 1) * d), kg, 0)
                 for i in range(g)], axis=0)  # [g*Sp, 128] K staircase
        vt_scr[:, :] = v.transpose((1, 0))    # [C, Sp], once per batch row

    xt = x_tile_ref[0]
    xn = _ln(xt, lns, lnb, eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (sp, tq), 0)
    out_blocks = []
    for g2 in range(n_groups):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg = q[:, sl]
        # logits pre-transposed: [g*Sp, tq] (zero staircase lanes fill the
        # 128-lane contraction exactly — no MXU waste, same as the straight
        # QK form)
        lt = jax.lax.dot_general(
            ks_scr[:, sl], qg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for i in range(g):
            lt_i = jax.lax.slice_in_dim(lt, i * sp, (i + 1) * sp, axis=0)
            if s_valid < sp:  # static: mask only when S was padded
                lt_i = jnp.where(row < s_valid, lt_i, NEG_INF)
            m = jnp.max(lt_i, axis=0, keepdims=True)       # over keys (rows)
            p = jnp.exp(lt_i - m)
            pn = (p / jnp.sum(p, axis=0, keepdims=True)).astype(xt.dtype)
            # o_hᵀ = v_hᵀ [d, Sp] · pᵀ [Sp, tq] — full-lane output
            out_blocks.append(jax.lax.dot_general(
                vt_scr[g2 * LANES + i * d:g2 * LANES + (i + 1) * d, :], pn,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))

    attn_t = jnp.concatenate(out_blocks, axis=0).astype(xt.dtype)  # [C, tq]
    # out-proj consumed transposed too: outᵀ = Woᵀ·attnᵀ
    out_t = jax.lax.dot_general(
        wo_ref[:, :], attn_t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [C_out, tq]
    out = out_t.transpose((1, 0)) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


def _kernel_kt(x_full_ref, x_tile_ref, lns_ref, lnb_ref, wq_ref, wk_ref,
               wv_ref, wo_ref, bo_ref, o_ref, kst_scr, vt_scr, *,
               heads: int, s_valid: int, eps: float, sm_scale: float):
    """K-staircase transposed-PV kernel (v2 of the transposed idea).

    The straight kernel's PV product keeps only d of 128 output lanes per
    packed head — (g-1)/g of the S² PV MXU work is waste. Here the
    STAIRCASE moves to K (built once per batch row in scratch), logits come
    out of the MXU already transposed ([g·Sp, tq], full lanes), and PV runs
    per head as vᵀ[d, Sp] · e[Sp, tq] — every output lane useful, head
    slices of the vᵀ scratch are free sublane views.

    What the two failed variants (docs/PERF.md r3) paid that this avoids:
    * _kernel_t reduced BOTH max and sum over sublanes per head; here the
      softmax denominator is a onesᵀ·e MXU matmul ([Sp,8]ᵀ — negligible
      FLOPs), leaving the rowwise max as the only cross-sublane reduce.
    * the straight+PV-transpose hybrid sliced v per head in LANES
      ([Sp, d] offset views forcing Mosaic relayouts); the vᵀ layout makes
      head slices sublane-aligned row views.
    * pad-key masking folds into one zero-select on e (the max may include
      the finite pad-row logits — harmless as a shift), not a −inf mask
      pass on logits.

    Query tiles should be lane-exact (tq % 128 == 0) — the transposed
    logits/PV outputs carry tq in the lane dim.
    """

    j = pl.program_id(1)
    c = x_tile_ref.shape[-1]   # LN/residual width
    cq = wq_ref.shape[-1]      # q/k/v width = heads * (padded) head dim
    d = cq // heads
    g = LANES // d
    n_groups = cq // LANES
    tq = x_tile_ref.shape[1]
    sp = vt_scr.shape[-1]

    lns = lns_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        xf = _ln(x_full_ref[0], lns, lnb, eps).astype(x_full_ref.dtype)
        k = jax.lax.dot_general(
            xf, wk_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(kst_scr.dtype)
        v = jax.lax.dot_general(
            xf, wv_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(vt_scr.dtype)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (sp, LANES), 1)
        for g2 in range(n_groups):
            sl = slice(g2 * LANES, (g2 + 1) * LANES)
            kg = k[:, sl]
            kst_scr[:, sl] = jnp.concatenate(
                [jnp.where((lane_k >= i * d) & (lane_k < (i + 1) * d), kg, 0)
                 for i in range(g)], axis=0)   # [g*Sp, 128] K staircase
        vt_scr[:, :] = v.transpose((1, 0))     # [Cq, Sp], once per batch row

    xt = x_tile_ref[0]
    xn = _ln(xt, lns, lnb, eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)          # [tq, Cq], heads in lanes

    masked = s_valid < sp
    if masked:
        row = jax.lax.broadcasted_iota(jnp.int32, (sp, tq), 0)
    ones = jnp.ones((sp, 8), xt.dtype)
    out_blocks = []
    for g2 in range(n_groups):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        # transposed logits for all g heads of this group in one matmul:
        # row block i = head i's [Sp, tq] (K staircase zeros select head
        # i's lanes of q; full 128-lane contraction, no MXU waste)
        lt = jax.lax.dot_general(
            kst_scr[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [g*Sp, tq]
        for i in range(g):
            lt_i = jax.lax.slice_in_dim(lt, i * sp, (i + 1) * sp, axis=0)
            # pad-key rows hold finite (LN(0)-bias) logits; including them
            # in the max only shifts the exp — their e rows are zeroed.
            m = jnp.max(lt_i, axis=0, keepdims=True)      # [1, tq]
            e = jnp.exp(lt_i - m)
            if masked:
                e = jnp.where(row < s_valid, e, 0.0)
            e = e.astype(xt.dtype)                        # [Sp, tq] bf16
            # softmax denominator on the MXU: onesᵀ[8, Sp] · e -> [8, tq]
            denom = jax.lax.dot_general(
                ones, e, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0:1, :]
            # PV with zero lane waste: vᵀ[d, Sp] · e[Sp, tq] -> [d, tq];
            # the head's vᵀ rows are an 8-aligned sublane view.
            vt_i = vt_scr[g2 * LANES + i * d:g2 * LANES + (i + 1) * d, :]
            o_i = jax.lax.dot_general(
                vt_i, e, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_blocks.append(o_i / denom)

    attn_t = jnp.concatenate(out_blocks, axis=0).astype(xt.dtype)  # [Cq, tq]
    out_t = jax.lax.dot_general(
        wo_ref[:, :], attn_t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # [C_out, tq] = Woᵀ·attnᵀ
    out = out_t.transpose((1, 0)) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


def kt_applicable(s: int, heads: int, d_in: int) -> bool:
    """Route to the transposed-PV kernel: it pays off when g >= 2 heads
    share a lane group (g = 1 has no staircase PV waste to remove) and the
    sequence is long enough for a lane-exact 256 query tile."""

    d = _pad_head_dim(d_in)
    if d is None or not fused_block_applicable(heads, d_in):
        return False
    return (LANES // d) >= 2 and s >= 256


def fused_ln_self_attention(
    x: jnp.ndarray,       # [B, S, C]
    ln_scale: jnp.ndarray,  # [C]
    ln_bias: jnp.ndarray,   # [C]
    wq: jnp.ndarray,        # [C, C]
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,        # [C]
    heads: int,
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
    transposed: Optional[bool] = None,
    kt: Optional[bool] = None,
    prepadded: bool = False,
    pipe: Optional[bool] = None,
) -> jnp.ndarray:
    """x + OutProj(MHA(LN(x))) in one kernel. Requires C % 128 == 0 and
    head_dim dividing 128 with aligned head groups (callers route).

    ``transposed`` selects the transposed-logits kernel (_kernel_t) whose
    PV product has no staircase lane waste; default from env AP_ATTN_T.
    ``kt`` selects the v2 K-staircase transposed-PV kernel (_kernel_kt);
    default from env AP_ATTN_KT (callers may route via kt_applicable).
    ``prepadded``: wq/wk/wv/wo already carry the head padding (serving-prep
    collection, models/unet_blocks.py) — XLA does not hoist the per-step
    re-pads out of the DDIM while loop, so serving pads once at build.
    """

    import os

    if transposed is None:
        transposed = os.environ.get("AP_ATTN_T", "0") == "1"
    if kt is None:
        kt = os.environ.get("AP_ATTN_KT", "0") == "1"
    if pipe is None:
        pipe = os.environ.get("AP_ATTN_PIPE", "0") == "1"
    b, s, c = x.shape
    d_in = c // heads
    d = _pad_head_dim(d_in)
    assert d is not None and fused_block_applicable(heads, d_in) and c % LANES == 0
    cq = heads * d
    if d != d_in and not prepadded:
        # fold the head padding into the weights (zero pad lanes — exact)
        wq = _pad_heads_in(wq, heads, d_in, d)
        wk = _pad_heads_in(wk, heads, d_in, d)
        wv = _pad_heads_in(wv, heads, d_in, d)
        wo = _pad_heads_out(wo, heads, d_in, d)
    if d != d_in:
        transposed = False  # _kernel_t keeps the aligned-d layout only
    g = LANES // d
    kt = kt and kt_applicable(s, heads, d_in)
    if kt:
        # transposed outputs carry tq in lanes — keep the tile lane-exact
        tile_q = 256 if s > 256 else _round_up(s, 8)
    else:
        tile_q = pick_tile_q(s, tile_q)
    sp = _round_up(s, tile_q)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    if kt:
        kernel = functools.partial(_kernel_kt, heads=heads, s_valid=s, eps=eps,
                                   sm_scale=float(d_in) ** -0.5)
        scratch = [
            pltpu.VMEM((g * sp, cq), dt),  # K staircase per lane group
            pltpu.VMEM((cq, sp), dt),      # vᵀ
        ]
    elif transposed:
        kernel = functools.partial(_kernel_t, heads=heads, s_valid=s, eps=eps,
                                   sm_scale=float(d_in) ** -0.5)
        scratch = [
            pltpu.VMEM((g * sp, cq), dt),  # K staircase per lane group
            pltpu.VMEM((cq, sp), dt),      # vᵀ
        ]
    else:
        body = _kernel_pipe if pipe else _kernel
        kernel = functools.partial(body, heads=heads, s_valid=s, eps=eps,
                                   sm_scale=float(d_in) ** -0.5)
        scratch = [
            pltpu.VMEM((sp, cq), dt),
            pltpu.VMEM((sp, cq), dt),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, sp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, xp, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      cast(wq), cast(wk), cast(wv), cast(wo), cast(bo).reshape(1, c))
    return out[:, :s]


def _bwd_kernel(x_full_ref, g_full_ref, x_tile_ref, g_tile_ref, lns_ref,
                lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref, dx_ref,
                k_scr, v_scr, gxn_scr, dk_scr, dv_scr, *,
                heads: int, s_valid: int, eps: float, sm_scale: float):
    """dx of ``x + Wo·MHA(LN(x))`` — the data-path gradient only (parameter
    grads stay in XLA and are DCE'd in adapter-only training).

    Same head-packed staircase layout as the forward, run in reverse:
    per query tile, softmax probs are recomputed from k/v scratch, then
    dv = Pᵀ·gs and dk = dlogitsᵀ·qs land per-head via the zeroed-lane
    blocks, accumulating across tiles in fp32 scratch; the epilogue (last
    tile) folds dq/dk/dv through Wq/Wk/Wv and runs the LayerNorm backward
    over the whole sequence, adding the residual cotangent."""

    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
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
        gxn_scr[:, :] = jnp.zeros_like(gxn_scr)
        dk_scr[:, :] = jnp.zeros_like(dk_scr)
        dv_scr[:, :] = jnp.zeros_like(dv_scr)

    xt = x_tile_ref[0]
    gt = g_tile_ref[0]
    xn = _ln(xt, lns, lnb, eps).astype(xt.dtype)
    q = (jax.lax.dot_general(xn, wq_ref[:, :], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         * sm_scale).astype(xt.dtype)
    # d(out)/d(attn): g @ Wo^T
    gattn = jax.lax.dot_general(
        gt, wo_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(xt.dtype)  # [tq, C]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    dq_groups = []
    for g2 in range(n_groups):
        sl = slice(g2 * LANES, (g2 + 1) * LANES)
        qg, kg, vg = q[:, sl], k_scr[:, sl], v_scr[:, sl]
        gg = gattn[:, sl]
        qs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), qg, 0)
             for i in range(g)], axis=0)     # [g*tq, 128]
        gs = jnp.concatenate(
            [jnp.where((lane >= i * d) & (lane < (i + 1) * d), gg, 0)
             for i in range(g)], axis=0)
        logits = jax.lax.dot_general(
            qs, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if s_valid < k_scr.shape[0]:  # static: mask only when S was padded
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < s_valid, logits, NEG_INF)
        # recompute via the same flag-honoring softmax the forward ran, so
        # probs bitwise-match the forward under every flag combination
        p, denom = _softmax_probs(logits, xt.dtype)
        probs = (p / denom).astype(xt.dtype)

        # dv: P^T @ gs — head blocks land in their own lanes (gs zeros)
        dv_scr[:, sl] += jax.lax.dot_general(
            probs, gs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP then dlogits (softmax backward, rowwise)
        dp = jax.lax.dot_general(
            gs, vg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        probs32 = probs.astype(jnp.float32)
        rowdot = jnp.sum(dp * probs32, axis=-1, keepdims=True)
        dlog = (probs32 * (dp - rowdot)).astype(xt.dtype)  # [g*tq, Sp]
        # dk: dlog^T @ qs (staircase reverses itself)
        dk_scr[:, sl] += jax.lax.dot_general(
            dlog, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dq (scaled): dlog @ kg, un-staircased back to [tq, 128]
        dq_full = jax.lax.dot_general(
            dlog, kg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqg = jnp.zeros((tq, LANES), jnp.float32)
        for i in range(g):
            blk = jax.lax.slice_in_dim(dq_full, i * tq, (i + 1) * tq, axis=0)
            dqg = dqg + jnp.where((lane >= i * d) & (lane < (i + 1) * d), blk, 0)
        dq_groups.append((dqg * sm_scale).astype(xt.dtype))

    dq = jnp.concatenate(dq_groups, axis=1)  # [tq, C] d/d(xn@Wq)
    gxn_scr[pl.ds(j * tq, tq), :] += jax.lax.dot_general(
        dq, wq_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_tiles - 1)
    def _():
        gxn = (gxn_scr[:, :]
               + jax.lax.dot_general(
                   dk_scr[:, :].astype(xt.dtype), wk_ref[:, :],
                   (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   dv_scr[:, :].astype(xt.dtype), wv_ref[:, :],
                   (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
        xf = x_full_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        nhat = xc * rstd
        gn = gxn * lns
        m1 = jnp.mean(gn, axis=-1, keepdims=True)
        m2 = jnp.mean(gn * nhat, axis=-1, keepdims=True)
        dx = rstd * (gn - m1 - nhat * m2) + g_full_ref[0].astype(jnp.float32)
        dx_ref[0] = dx.astype(dx_ref.dtype)


def fused_ln_self_attention_bwd_dx(
    x: jnp.ndarray, grad: jnp.ndarray, ln_scale, ln_bias, wq, wk, wv, wo,
    heads: int, eps: float = 1e-5, tile_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Input gradient of fused_ln_self_attention (one kernel)."""

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
    tile_q = pick_tile_q(s, tile_q)
    sp = _round_up(s, tile_q)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    gp = jnp.pad(jnp.asarray(grad, x.dtype), ((0, 0), (0, sp - s), (0, 0)))
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    full = pl.BlockSpec((1, sp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    mat_in = pl.BlockSpec((c, cq), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    mat_out = pl.BlockSpec((cq, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, s_valid=s, eps=eps,
                          sm_scale=float(d_in) ** -0.5),
        grid=(b, sp // tile_q),
        in_specs=[full, full, tile, tile, vec, vec, mat_in, mat_in, mat_in, mat_out],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((b, sp, c), grad.dtype),
        scratch_shapes=[
            pltpu.VMEM((sp, cq), dt),          # k
            pltpu.VMEM((sp, cq), dt),          # v
            pltpu.VMEM((sp, c), jnp.float32),   # gxn accumulator
            pltpu.VMEM((sp, cq), jnp.float32),  # dk accumulator
            pltpu.VMEM((sp, cq), jnp.float32),  # dv accumulator
        ],
        interpret=interpret,
    )(xp, gp, xp, gp, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      cast(wq), cast(wk), cast(wv), cast(wo))
    return dx[:, :s]


def _xla_reference(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads, eps):
    """Same math in plain XLA (fallback path + custom-VJP backward)."""

    b, s, c = x.shape
    d = c // heads
    xn = _ln(x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32), eps).astype(x.dtype)
    q = (xn @ wq).reshape(b, s, heads, d)
    k = (xn @ wk).reshape(b, s, heads, d)
    v = (xn @ wv).reshape(b, s, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (float(d) ** -0.5), axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
    return x + (attn @ wo + bo).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_ln_self_attention_vjp(x, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                                heads: int, eps: float, tile_q: int = 256):
    """Pallas forward, XLA backward (adapter training differentiates through
    all UNet activations even though only adapter grads are kept)."""

    return fused_ln_self_attention(x, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                                   heads, eps=eps, tile_q=tile_q)


def _fwd(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads, eps, tile_q):
    out = fused_ln_self_attention(x, ln_scale, ln_bias, wq, wk, wv, wo, bo,
                                  heads, eps=eps, tile_q=tile_q)
    return out, (x, ln_scale, ln_bias, wq, wk, wv, wo, bo)


def _bwd(heads, eps, tile_q, res, grad):
    """dx via the Pallas bwd kernel; parameter grads as XLA expressions
    (dead-code-eliminated in adapter-only training — every weight here is
    frozen, so the one fused dx kernel is all that runs)."""

    x, ln_scale, ln_bias, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, heads, eps),
        x, ln_scale, ln_bias, wq, wk, wv, wo, bo)
    dx_xla, dls, dlb, dwq, dwk, dwv, dwo, dbo = vjp(grad)
    from ap_adapter_tpu.ops.attention import _on_tpu

    if _on_tpu():
        dx = fused_ln_self_attention_bwd_dx(
            x, grad, ln_scale, ln_bias, wq, wk, wv, wo, heads, eps=eps,
            tile_q=_bwd_tile_q(x.shape[1], x.shape[2], heads))
    else:
        dx = dx_xla
    return dx, dls, dlb, dwq, dwk, dwv, dwo, dbo


def _bwd_tile_q(s: int, c: int, heads: int) -> int:
    """Bwd query tile: logits + probs + dP fp32 blocks within ~8 MB (the
    fixed scratch — k/v + 3 fp32 accumulators — takes ~5.5 MB at S=1024,
    C=256)."""

    g = LANES // (c // heads)
    sp = _round_up(s, 64)
    for tq in (128, 64):
        if 3 * g * tq * sp * 4 <= 8 * 1024 * 1024:
            return tq
    return 64


fused_ln_self_attention_vjp.defvjp(_fwd, _bwd)
