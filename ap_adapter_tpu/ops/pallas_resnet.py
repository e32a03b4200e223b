"""Fully-fused ResnetBlock2D kernel: GN+SiLU -> conv3x3 -> +temb ->
GN+SiLU -> conv3x3 -> +shortcut in ONE Pallas kernel.

The UNet's 22 resnets are pure HBM glue in the XLA schedule: each block is
2 GroupNorm statistic passes (fp32 convert_reduce), 2 SiLU elementwise
passes, 2 conv reads/writes, a time-embedding add and a residual add — at
batch 24 the trace shows ~45 ms/step of elementwise fusions +
convert_reduce, a large share of it at the resnet sites (docs/PERF.md r3
trace). Here each batch row's slab is read ONCE into VMEM and the whole
block computes in-core; only the final output is written back.

Design notes (TPU):
* The [H, W, C] slab is kept flattened [H*W, C] (C in lanes). A 3x3 conv
  is 9 shifted matmuls: tap (dh, dw) contributes ``roll(y, dh*W+dw) @
  w_tap`` with a row mask for the H/W boundaries — ``pltpu.roll`` along
  sublanes is cheap, and the taps' [HW, Cin] x [Cin, Cout] matmuls are
  exactly the MXU-shaped work the conv lowers to anyway (same FLOPs,
  zero HBM traffic between taps).
* GroupNorm statistics use the indicator-matmul trick of
  ops/pallas_groupnorm.py (per-group sums as ``col_sums @ 0/1-matrix``)
  with fp32 accumulation; pad rows are masked out of both stats passes.
* The time-embedding projection (Dense over [B, time_embed_dim]) stays in
  XLA — it is [B, Cout]-tiny — and enters the kernel as one row per batch.
* Conv weights arrive reshaped [9*Cin, Cout] (tap-major), biases as rows.

Reference semantics: diffusers ResnetBlock2D (modeling_audioldm2.py UNet
blocks); this fuses models/unet_blocks.py::ResnetBlock2D's exact math.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _group_norm_silu(x, gamma_ref, beta_ref, groups: int, n_valid: int,
                     eps: float):
    """GN+SiLU over a [HWp, C] slab (pad rows zero); returns fp32."""

    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    col_sum = jnp.sum(xf, axis=0, keepdims=True)       # [1, C]
    col_sq = jnp.sum(xf * xf, axis=0, keepdims=True)

    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ind = (ch // (c // groups) == gr).astype(jnp.float32)  # [C, G]

    n = float(n_valid * (c // groups))
    mean_g = jax.lax.dot_general(col_sum, ind, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / n
    sq_g = jax.lax.dot_general(col_sq, ind, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) / n
    rstd_g = jax.lax.rsqrt(sq_g - mean_g * mean_g + eps)
    mean_c = jax.lax.dot_general(mean_g, ind.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, ind.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    gamma = gamma_ref[0].astype(jnp.float32)
    beta = beta_ref[0].astype(jnp.float32)
    y = (xf - mean_c) * (rstd_c * gamma) + beta
    return y * jax.nn.sigmoid(y)


def _conv3x3(y, w_ref, b_ref, w_width: int, n_valid: int):
    """3x3 SAME conv over the flattened [HWp, Cin] slab (pad rows zero).

    ``w_ref`` is [9*Cin, Cout] tap-major ((dh, dw) in row-major order).
    Returns fp32 [HWp, Cout] with pad rows zeroed."""

    hwp, cin = y.shape
    cout = w_ref.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (hwp, 1), 0)
    wcol = jax.lax.rem(row, w_width)
    acc = jnp.zeros((hwp, cout), jnp.float32)
    t = 0
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            s = dh * w_width + dw
            # circular roll so ys[i] = y[i+s]; pltpu.roll wants shift >= 0
            ys = pltpu.roll(y, (-s) % hwp, axis=0) if s != 0 else y
            src = row + s
            # given 0 <= wcol+dw < W, src in [0, HW) <=> 0 <= h+dh < H
            ok = ((src >= 0) & (src < n_valid)
                  & (wcol + dw >= 0) & (wcol + dw < w_width))
            ys = jnp.where(ok, ys, 0)
            acc = acc + jax.lax.dot_general(
                ys, w_ref[t * cin:(t + 1) * cin, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t += 1
    acc = acc + b_ref[0].astype(jnp.float32)
    return jnp.where(row < n_valid, acc, 0.0)


def _kernel(x_ref, temb_ref, g1_ref, b1_ref, w1_ref, wb1_ref, g2_ref, b2_ref,
            w2_ref, wb2_ref, wsc_ref, bsc_ref, o_ref, *,
            groups: int, w_width: int, n_valid: int, eps: float,
            has_temb: bool, has_sc: bool):
    x = x_ref[0]  # [HWp, Cin], pad rows zero
    dt = x.dtype

    y1 = _group_norm_silu(x, g1_ref, b1_ref, groups, n_valid, eps).astype(dt)
    h = _conv3x3(y1, w1_ref, wb1_ref, w_width, n_valid)
    if has_temb:
        h = h + temb_ref[0].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (h.shape[0], 1), 0)
    h = jnp.where(row < n_valid, h, 0.0)

    y2 = _group_norm_silu(h.astype(dt), g2_ref, b2_ref, groups, n_valid,
                          eps).astype(dt)
    out = _conv3x3(y2, w2_ref, wb2_ref, w_width, n_valid)

    if has_sc:
        sc = jax.lax.dot_general(
            x, wsc_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bsc_ref[0].astype(jnp.float32)
    else:
        sc = x.astype(jnp.float32)
    o_ref[0] = (out + sc).astype(o_ref.dtype)


# whole-slab budget: x + y1 + h(fp32) + y2 + out + weights, double-buffered
# input. Conservative ceiling keeps the L0 [4000, 384] slab OFF this kernel
# unless measurement says otherwise (see fused_resnet_fits).
_VMEM_BUDGET = 12 * 1024 * 1024


def fused_resnet_fits(h: int, w: int, c_in: int, c_out: int,
                      itemsize: int = 2) -> bool:
    hw = _round_up(h * w, 8)
    slabs = hw * (2 * c_in + 2 * c_out) * itemsize   # x, y1 (bf16) + y2, out
    slabs += hw * c_out * 4                          # h fp32 accumulator
    weights = (9 * c_in * c_out + 9 * c_out * c_out + c_in * c_out) * itemsize
    return slabs + weights <= _VMEM_BUDGET


def fused_resnet_block(
    x: jnp.ndarray,                    # [B, H, W, C_in]
    temb: Optional[jnp.ndarray],       # [B, C_out] (projected, pre-silu'd x W)
    gn1_scale, gn1_bias,               # [C_in]
    conv1_w,                           # [3, 3, C_in, C_out] (HWIO, as nn.Conv)
    conv1_b,                           # [C_out]
    gn2_scale, gn2_bias,               # [C_out]
    conv2_w,                           # [3, 3, C_out, C_out]
    conv2_b,                           # [C_out]
    sc_w=None, sc_b=None,              # [1, 1, C_in, C_out] / [C_out]
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, w, c_in = x.shape
    c_out = conv1_w.shape[-1]
    hw = h * w
    hwp = _round_up(hw, 8)
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    xp = x.reshape(b, hw, c_in)
    if hwp != hw:
        xp = jnp.pad(xp, ((0, 0), (0, hwp - hw), (0, 0)))

    w1 = cast(conv1_w).reshape(9 * c_in, c_out)
    w2 = cast(conv2_w).reshape(9 * c_out, c_out)
    has_sc = sc_w is not None
    wsc = cast(sc_w).reshape(c_in, c_out) if has_sc else jnp.zeros((8, 128), dt)
    bsc = cast(sc_b).reshape(1, c_out) if has_sc else jnp.zeros((1, 128), dt)
    has_temb = temb is not None
    tb = cast(temb) if has_temb else jnp.zeros((b, c_out), dt)

    vec_in = pl.BlockSpec((1, c_in), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_out = pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, w_width=w, n_valid=hw,
                          eps=eps, has_temb=has_temb, has_sc=has_sc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hwp, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vec_in, vec_in,
            pl.BlockSpec((9 * c_in, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_out,
            vec_out, vec_out,
            pl.BlockSpec((9 * c_out, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_out,
            pl.BlockSpec(wsc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bsc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hwp, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hwp, c_out), dt),
        interpret=interpret,
    )(xp, tb, cast(gn1_scale).reshape(1, c_in), cast(gn1_bias).reshape(1, c_in),
      w1, cast(conv1_b).reshape(1, c_out),
      cast(gn2_scale).reshape(1, c_out), cast(gn2_bias).reshape(1, c_out),
      w2, cast(conv2_b).reshape(1, c_out), wsc, bsc)
    return out[:, :hw].reshape(b, h, w, c_out)


def _xla_reference(x, temb, gn1_scale, gn1_bias, conv1_w, conv1_b, gn2_scale,
                   gn2_bias, conv2_w, conv2_b, sc_w, sc_b, groups, eps):
    """Same math in XLA (parity oracle + custom-VJP backward)."""

    def gn_silu(h, scale, bias):
        b_, hh, ww, c = h.shape
        hf = h.astype(jnp.float32).reshape(b_, hh * ww, groups, c // groups)
        mean = jnp.mean(hf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(hf - mean), axis=(1, 3), keepdims=True)
        y = (hf - mean) * jax.lax.rsqrt(var + eps)
        y = y.reshape(b_, hh, ww, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return (y * jax.nn.sigmoid(y)).astype(x.dtype)

    def conv(h, w_, b_):
        y = jax.lax.conv_general_dilated(
            h, jnp.asarray(w_, h.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.asarray(b_, h.dtype)

    h = conv(gn_silu(x, gn1_scale, gn1_bias), conv1_w, conv1_b)
    if temb is not None:
        h = h + jnp.asarray(temb, h.dtype)[:, None, None, :]
    out = conv(gn_silu(h, gn2_scale, gn2_bias), conv2_w, conv2_b)
    if sc_w is not None:
        sc = jax.lax.conv_general_dilated(
            x, jnp.asarray(sc_w, x.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(sc_b, x.dtype)
    else:
        sc = x
    return sc + out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def fused_resnet_block_vjp(x, temb, gn1_scale, gn1_bias, conv1_w, conv1_b,
                           gn2_scale, gn2_bias, conv2_w, conv2_b, sc_w, sc_b,
                           groups: int, eps: float):
    """Pallas forward, XLA backward (all resnet weights are frozen in
    adapter training — their grads DCE away; dx flows through the XLA
    reference's autodiff)."""

    return fused_resnet_block(
        x, temb, gn1_scale, gn1_bias, conv1_w, conv1_b, gn2_scale, gn2_bias,
        conv2_w, conv2_b, sc_w=sc_w, sc_b=sc_b, groups=groups, eps=eps)


def _fwd(x, temb, gn1_scale, gn1_bias, conv1_w, conv1_b, gn2_scale, gn2_bias,
         conv2_w, conv2_b, sc_w, sc_b, groups, eps):
    out = fused_resnet_block(
        x, temb, gn1_scale, gn1_bias, conv1_w, conv1_b, gn2_scale, gn2_bias,
        conv2_w, conv2_b, sc_w=sc_w, sc_b=sc_b, groups=groups, eps=eps)
    return out, (x, temb, gn1_scale, gn1_bias, conv1_w, conv1_b, gn2_scale,
                 gn2_bias, conv2_w, conv2_b, sc_w, sc_b)


def _bwd(groups, eps, res, grad):
    args = res
    diff = [a for a in args if a is not None]
    idx = [i for i, a in enumerate(args) if a is not None]

    def f(*live):
        full = list(args)
        for i, a in zip(idx, live):
            full[i] = a
        return _xla_reference(*full, groups, eps)

    _, vjp = jax.vjp(f, *diff)
    grads = vjp(grad)
    out = [None] * len(args)
    for i, g in zip(idx, grads):
        out[i] = g
    return tuple(out)


fused_resnet_block_vjp.defvjp(_fwd, _bwd)
