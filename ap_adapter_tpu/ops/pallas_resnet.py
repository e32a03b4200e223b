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


_CHUNK = 128  # lane-chunk width for the fp32 roll working set

# Mosaic layout rule learned the hard way (see docs/PERF.md): lane-SLICING a
# computed [1, C] row (e.g. ``scale_c[:, 128:256]``) yields an offset-carrying
# register view, and ``vector.broadcast`` of an offset view is unimplemented
# ("Invalid input layout"). Every row that gets broadcast below is therefore
# either a fresh ref load or a per-chunk dot result — both offset-0.


def _gn_group_stats(read_chunk, c: int, groups: int, n_valid: int,
                    eps: float):
    """Per-group GN statistics: returns fp32 (mean_g, rstd_g), each [1, G].

    ``read_chunk(c0, ce)`` must return the fp32 [HWp, ce-c0] lane-chunk of
    the slab (pad rows zero). Column sums accumulate chunk-wise so the full
    slab is never materialized in fp32; the per-group reduction uses the
    indicator-matmul trick of ops/pallas_groupnorm.py."""

    sums, sqs = [], []
    for c0 in range(0, c, _CHUNK):
        xf = read_chunk(c0, min(c0 + _CHUNK, c))
        sums.append(jnp.sum(xf, axis=0, keepdims=True))
        sqs.append(jnp.sum(xf * xf, axis=0, keepdims=True))
    col_sum = jnp.concatenate(sums, axis=1) if len(sums) > 1 else sums[0]
    col_sq = jnp.concatenate(sqs, axis=1) if len(sqs) > 1 else sqs[0]

    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ind = (ch // (c // groups) == gr).astype(jnp.float32)  # [C, G]

    n = float(n_valid * (c // groups))
    mean_g = jax.lax.dot_general(col_sum, ind, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / n
    sq_g = jax.lax.dot_general(col_sq, ind, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) / n
    rstd_g = jax.lax.rsqrt(sq_g - mean_g * mean_g + eps)
    return mean_g, rstd_g


def _conv3x3_gn(read_chunk, gam_ref, bet_ref, mean_g, rstd_g, cin: int,
                w_ref, b_ref, groups: int, w_width: int, hwp: int,
                n_valid: int, mxu_dtype):
    """Fused (GroupNorm + SiLU + 3x3 SAME conv) over the flattened [HWp, C]
    slab (pad rows zero).

    GN+SiLU is elementwise once the stats are known, so the shifted
    normalized slab equals the normalization of the shifted source — the
    taps roll y = silu(gn(src)) directly. Mosaic's sublane rotate only
    exists for 32-bit data, so y is built per 128-lane chunk in fp32
    (chunk-outer / tap-inner keeps one [HWp, 128] fp32 working set live
    instead of a full fp32 slab), rolled, masked, and cast to
    ``mxu_dtype`` for the MXU matmul.

    ``read_chunk(c0, ce)`` returns the fp32 source lane-chunk (a fresh ref
    load — see the layout note above); ``gam_ref``/``bet_ref`` are
    [ceil(C/128), 128] row-chunked affine params; per-chunk mean/rstd rows
    come from [1, G] @ chunk-indicator dots so every broadcast source is
    offset-0. ``w_ref`` is [9*Cin, Cout] tap-major ((dh, dw) row-major).
    Returns fp32 [HWp, Cout] with pad rows zeroed."""

    cout = w_ref.shape[-1]
    gsize = cin // groups
    row = jax.lax.broadcasted_iota(jnp.int32, (hwp, 1), 0)
    wcol = jax.lax.rem(row, w_width)
    acc = jnp.zeros((hwp, cout), jnp.float32)
    for k, c0 in enumerate(range(0, cin, _CHUNK)):
        ce = min(c0 + _CHUNK, cin)
        cw = ce - c0
        # per-chunk stat rows via fresh dots: [1, G] @ [G, cw] -> [1, cw]
        ch = jax.lax.broadcasted_iota(jnp.int32, (groups, cw), 1) + c0
        gr = jax.lax.broadcasted_iota(jnp.int32, (groups, cw), 0)
        ind_c = (ch // gsize == gr).astype(jnp.float32)
        m_c = jax.lax.dot_general(mean_g, ind_c, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        r_c = jax.lax.dot_general(rstd_g, ind_c, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        gam = gam_ref[k][:cw].astype(jnp.float32)   # fresh 1-D loads
        bet = bet_ref[k][:cw].astype(jnp.float32)
        scale = r_c * gam
        shift = bet - m_c * scale
        y = read_chunk(c0, ce) * scale + shift
        y = y * jax.nn.sigmoid(y)
        t = 0
        for dh in (-1, 0, 1):
            for dw in (-1, 0, 1):
                s = dh * w_width + dw
                # circular roll: ys[i] = y[i+s]; pltpu.roll wants shift >= 0
                ys = pltpu.roll(y, (-s) % hwp, axis=0) if s != 0 else y
                src_row = row + s
                # given 0 <= wcol+dw < W, src in [0, HW) <=> 0 <= h+dh < H
                ok = ((src_row >= 0) & (src_row < n_valid)
                      & (wcol + dw >= 0) & (wcol + dw < w_width))
                ys = jnp.where(ok, ys, 0).astype(mxu_dtype)
                acc = acc + jax.lax.dot_general(
                    ys, w_ref[t * cin + c0:t * cin + ce, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                t += 1
    acc = acc + b_ref[0].astype(jnp.float32)
    return jnp.where(row < n_valid, acc, 0.0)


def _kernel(x_ref, temb_ref, g1_ref, b1_ref, w1_ref, wb1_ref, g2_ref, b2_ref,
            w2_ref, wb2_ref, wsc_ref, bsc_ref, o_ref, h_scr, *,
            groups: int, w_width: int, n_valid: int, eps: float,
            has_temb: bool, has_sc: bool):
    dt = o_ref.dtype
    hwp, cin = x_ref.shape[1], x_ref.shape[2]
    cout = o_ref.shape[2]

    read_x = lambda c0, ce: x_ref[0, :, c0:ce].astype(jnp.float32)
    m1, r1 = _gn_group_stats(read_x, cin, groups, n_valid, eps)
    h = _conv3x3_gn(read_x, g1_ref, b1_ref, m1, r1, cin, w1_ref, wb1_ref,
                    groups, w_width, hwp, n_valid, dt)
    if has_temb:
        h = h + temb_ref[0, 0].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (hwp, 1), 0)
    # match the XLA module: conv outputs live in the compute dtype (bf16);
    # staging h through VMEM scratch makes phase-2 chunk reads fresh loads
    h_scr[:, :] = jnp.where(row < n_valid, h, 0.0).astype(dt)

    read_h = lambda c0, ce: h_scr[:, c0:ce].astype(jnp.float32)
    m2, r2 = _gn_group_stats(read_h, cout, groups, n_valid, eps)
    out = _conv3x3_gn(read_h, g2_ref, b2_ref, m2, r2, cout, w2_ref, wb2_ref,
                      groups, w_width, hwp, n_valid, dt)

    if has_sc:
        sc = jax.lax.dot_general(
            x_ref[0], wsc_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bsc_ref[0].astype(jnp.float32)
    else:
        sc = x_ref[0].astype(jnp.float32)
    o_ref[0] = (out + sc).astype(o_ref.dtype)


# live-peak budget out of the 16 MB scoped VMEM (2 MB headroom): x block
# (double-buffered bf16), the chunked fp32 GN+roll working set (y, rolled
# copy, one transient — 3 x [HWp, 128] fp32), h in bf16 + one fp32 conv
# accumulator, double-buffered bf16 output, and the resident weights.
_VMEM_BUDGET = 14 * 1024 * 1024


def fused_resnet_fits(h: int, w: int, c_in: int, c_out: int,
                      itemsize: int = 2) -> bool:
    hw = _round_up(h * w, 8)
    slabs = hw * (2 * 2 * c_in + 3 * 4 * _CHUNK
                  + (4 + 2 + 2 * 2) * c_out) * itemsize // 2
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
    # [B, 1, C]: the grid-blocked dim must be leading so the block's last two
    # dims (1, C) satisfy Mosaic's sublane/lane divisibility rule.
    tb = (cast(temb) if has_temb else jnp.zeros((b, c_out), dt)).reshape(
        b, 1, c_out)

    def rows(v, c):
        # GN affine params as [ceil(C/128), 128] so the kernel's per-chunk
        # gamma/beta are whole-row 1-D ref loads (offset-0; see layout note)
        nc = (c + _CHUNK - 1) // _CHUNK
        if nc > 1:
            assert c % _CHUNK == 0, "multi-chunk channels must be 128-aligned"
            return cast(v).reshape(nc, _CHUNK)
        return cast(v).reshape(1, c)

    g1r, b1r = rows(gn1_scale, c_in), rows(gn1_bias, c_in)
    g2r, b2r = rows(gn2_scale, c_out), rows(gn2_bias, c_out)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    vec_out = pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, w_width=w, n_valid=hw,
                          eps=eps, has_temb=has_temb, has_sc=has_sc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hwp, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(g1r), full(b1r),
            pl.BlockSpec((9 * c_in, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_out,
            full(g2r), full(b2r),
            pl.BlockSpec((9 * c_out, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec_out,
            pl.BlockSpec(wsc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bsc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hwp, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hwp, c_out), dt),
        scratch_shapes=[pltpu.VMEM((hwp, c_out), dt)],
        interpret=interpret,
    )(xp, tb, g1r, b1r, w1, cast(conv1_b).reshape(1, c_out),
      g2r, b2r, w2, cast(conv2_b).reshape(1, c_out), wsc, bsc)
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
