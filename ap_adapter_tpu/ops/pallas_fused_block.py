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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_full_ref, x_tile_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
            wo_ref, bo_ref, o_ref, k_scr, v_scr, *,
            heads: int, s_valid: int, eps: float, sm_scale: float):
    j = pl.program_id(1)
    c = x_tile_ref.shape[-1]
    d = c // heads
    g = LANES // d           # heads per 128-lane group
    n_groups = c // LANES    # lane groups
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
        attn_groups.append(og.astype(xt.dtype))

    attn = jnp.concatenate(attn_groups, axis=1)  # [tq, C]
    out = jax.lax.dot_general(
        attn, wo_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


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
) -> jnp.ndarray:
    """x + OutProj(MHA(LN(x))) in one kernel. Requires C % 128 == 0 and
    head_dim dividing 128 with aligned head groups (callers route)."""

    b, s, c = x.shape
    d = c // heads
    assert c % LANES == 0 and LANES % d == 0 and heads % (LANES // d) == 0
    sp = _round_up(s, tile_q)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, s_valid=s, eps=eps,
                          sm_scale=float(d) ** -0.5),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, sp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        scratch_shapes=[
            pltpu.VMEM((sp, c), dt),
            pltpu.VMEM((sp, c), dt),
        ],
        interpret=interpret,
    )(xp, xp, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      cast(wq), cast(wk), cast(wv), cast(wo), cast(bo).reshape(1, c))
    return out[:, :s]


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
    x, ln_scale, ln_bias, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, heads, eps),
        x, ln_scale, ln_bias, wq, wk, wv, wo, bo)
    return vjp(grad)


fused_ln_self_attention_vjp.defvjp(_fwd, _bwd)
