"""Fused GroupNorm(+SiLU) Pallas kernel.

The UNet's resnet/Transformer2D GroupNorms dominated the non-attention
per-step cost in the r1 profile (~16 ms/step of ``convert_reduce`` fusions:
XLA materializes an fp32 copy of the bf16 activations to compute statistics,
then re-reads for normalization). This kernel reads x once into VMEM,
computes per-(batch, group) statistics with fp32 accumulation, and writes the
normalized (optionally SiLU'd) output once.

Cross-lane trick: with NHWC layout, a group = a contiguous slice of lanes.
Per-group sums are computed as ``row_sums @ indicator`` where indicator is a
static 0/1 [C, G] matrix — one tiny MXU op instead of a lane-strided
reduction; the broadcast back to channels is the transposed indicator.

Applies to the UNet hot path (whole [HW, C] slab fits VMEM); the VAE decoder
slabs at mel resolution are far larger and stay on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, g_ref, b_ref, o_ref, *, groups: int, n_valid: int,
            eps: float, act: bool):
    x = x_ref[0]  # [HWp, C], input dtype; padded rows are zeros
    c = x.shape[-1]
    xf = x.astype(jnp.float32)

    col_sum = jnp.sum(xf, axis=0, keepdims=True)          # [1, C]
    col_sq = jnp.sum(xf * xf, axis=0, keepdims=True)       # [1, C]

    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ind = (ch // (c // groups) == gr).astype(jnp.float32)   # [C, G]

    n = float(n_valid * (c // groups))
    mean_g = jax.lax.dot_general(col_sum, ind, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / n
    sq_g = jax.lax.dot_general(col_sq, ind, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) / n
    var_g = sq_g - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    # broadcast per-group stats back to per-channel lanes: [1,G] @ [G,C]
    mean_c = jax.lax.dot_general(mean_g, ind.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(rstd_g, ind.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    gamma = g_ref[0].astype(jnp.float32)  # [1, C]
    beta = b_ref[0].astype(jnp.float32)
    y = (xf - mean_c) * (rstd_c * gamma) + beta
    if act:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _tiled_kernel(x_ref, g_ref, b_ref, o_ref, sum_scr, sq_scr, *,
                  groups: int, n_valid: int, eps: float, act: bool,
                  tile: int):
    """Two-phase tiled GN+SiLU for slabs too large for whole-slab VMEM
    (the level-0 [4000, 128..384] UNet resnets). Grid (b, 2, n_tiles):
    phase 0 accumulates per-channel sums across HW tiles in scratch,
    phase 1 combines to group stats and writes the normalized tiles."""

    ph = pl.program_id(1)
    j = pl.program_id(2)
    x = x_ref[0]  # [tile, C]
    c = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + j * tile
    xf = jnp.where(row < n_valid, x.astype(jnp.float32), 0.0)

    @pl.when(ph == 0)
    def _():
        @pl.when(j == 0)
        def _():
            sum_scr[:, :] = jnp.zeros_like(sum_scr)
            sq_scr[:, :] = jnp.zeros_like(sq_scr)
        sum_scr[:, :] += jnp.sum(xf, axis=0, keepdims=True)
        sq_scr[:, :] += jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(ph == 1)
    def _():
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        ind = (ch // (c // groups) == gr).astype(jnp.float32)
        n = float(n_valid * (c // groups))
        mean_g = jax.lax.dot_general(sum_scr[:, :], ind, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) / n
        sq_g = jax.lax.dot_general(sq_scr[:, :], ind, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) / n
        rstd_g = jax.lax.rsqrt(sq_g - mean_g * mean_g + eps)
        mean_c = jax.lax.dot_general(mean_g, ind.T, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        rstd_c = jax.lax.dot_general(rstd_g, ind.T, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        gamma = g_ref[0].astype(jnp.float32)
        beta = b_ref[0].astype(jnp.float32)
        y = (x.astype(jnp.float32) - mean_c) * (rstd_c * gamma) + beta
        if act:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


# whole-slab kernel budget: x + fp32 copy + output live at once
_WHOLE_SLAB_BYTES = 6 * 1024 * 1024
_GN_TILE = 512


def fused_group_norm(
    x: jnp.ndarray,  # [B, N, C] (N = H*W tokens)
    gamma: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    groups: int,
    eps: float = 1e-5,
    act: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    b, n, c = x.shape
    if n * c * 16 > _WHOLE_SLAB_BYTES:
        tile = _GN_TILE
        np_ = _round_up(n, tile)
        xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_tiled_kernel, groups=groups, n_valid=n,
                              eps=eps, act=act, tile=tile),
            grid=(b, 2, np_ // tile),
            in_specs=[
                pl.BlockSpec((1, tile, c), lambda i, ph, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, ph, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, ph, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            # phase 0 parks the output window on block (i, 0); its garbage
            # flushes are overwritten by phase 1's ordered writes
            out_specs=pl.BlockSpec(
                (1, tile, c),
                lambda i, ph, j: (i, jax.lax.select(ph == 1, j, 0), 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, np_, c), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((1, c), jnp.float32),
                pltpu.VMEM((1, c), jnp.float32),
            ],
            interpret=interpret,
        )(xp, gamma.reshape(1, c), beta.reshape(1, c))
        return out[:, :n]

    np_ = _round_up(n, 8)
    xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, n_valid=n, eps=eps, act=act),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, c), x.dtype),
        interpret=interpret,
    )(xp, gamma.reshape(1, c), beta.reshape(1, c))
    return out[:, :n]


def _xla_reference(x, gamma, beta, groups, eps, act):
    b, n, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, n, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_silu(x, gamma, beta, groups: int, eps: float = 1e-5, act: bool = False):
    """Fused GroupNorm(+SiLU); Pallas forward, XLA backward (training)."""

    return fused_group_norm(x, gamma, beta, groups, eps=eps, act=act)


def _fwd(x, gamma, beta, groups, eps, act):
    return fused_group_norm(x, gamma, beta, groups, eps=eps, act=act), (x, gamma, beta)


def _bwd(groups, eps, act, res, grad):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda x, g, b: _xla_reference(x, g, b, groups, eps, act),
                     x, gamma, beta)
    return vjp(grad)


group_norm_silu.defvjp(_fwd, _bwd)
