"""Fused pre-LN GEGLU feed-forward kernel.

One Pallas kernel computes ``x + W2 @ (a * gelu(g))`` where
``[a ‖ g] = LN(x) W1 + b1`` — the BasicTransformerBlock norm3+ff path
(diffusers GEGLU; reference modeling_audioldm2.py Transformer2DModel blocks).
Unlike attention this is purely row-wise, so it applies to EVERY transformer
block in the UNet (all channel widths; S=1000/252/64). The win is the same
glue elimination as ops/pallas_fused_block.py: LN statistics, the [*, 2*4C]
GEGLU activations and the [*, 4C] product never touch HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from ap_adapter_tpu.ops.pallas_fused_block import pick_tile_q


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _erf(x):
    """fp32 erf via Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7): Mosaic has
    no erf primitive, but exp lowers fine."""

    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, inner: int, eps: float):
    xt = x_ref[0]  # [tq, C]
    xn = _ln(xt, lns_ref[0].astype(jnp.float32), lnb_ref[0].astype(jnp.float32),
             eps).astype(xt.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)  # [tq, 2*inner]
    a = jax.lax.slice_in_dim(h, 0, inner, axis=1)
    g = jax.lax.slice_in_dim(h, inner, 2 * inner, axis=1)
    # exact (erf) gelu — diffusers GEGLU default (approximate="none"):
    # gelu(g) = g * Phi(g)
    y = (a * g * 0.5 * (1.0 + _erf(g * (2.0 ** -0.5)))).astype(xt.dtype)
    out = jax.lax.dot_general(
        y, w2_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (xt.astype(jnp.float32) + out).astype(o_ref.dtype)


def fused_ln_geglu_ff(
    x: jnp.ndarray,        # [B, S, C]
    ln_scale: jnp.ndarray,  # [C]
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,        # [C, 2*inner]
    b1: jnp.ndarray,        # [2*inner]
    w2: jnp.ndarray,        # [inner, C]
    b2: jnp.ndarray,        # [C]
    eps: float = 1e-5,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    b, s, c = x.shape
    inner = w2.shape[0]
    assert w1.shape == (c, 2 * inner) and inner % 128 == 0 and c % 128 == 0
    tile_q = pick_tile_q(s, min(tile_q, _round_up(s, 64)))  # short sequences: one thin tile
    sp = _round_up(s, tile_q)
    if sp != s:
        x_in = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    else:
        x_in = x
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    out = pl.pallas_call(
        functools.partial(_kernel, inner=inner, eps=eps),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), dt),
        interpret=interpret,
    )(x_in, cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      cast(w1), cast(b1).reshape(1, 2 * inner), cast(w2), cast(b2).reshape(1, c))
    return out[:, :s]


def ff_tile_q(s: int, c: int, inner: int) -> int:
    """Largest tile whose weights + activations stay within ~12 MB VMEM."""

    w_bytes = (c * 2 * inner + inner * c) * 2
    for tq in (256, 128, 64):
        act = tq * (2 * inner * 4 + 2 * inner * 2 + 2 * c * 4)
        if w_bytes + act <= 12 * 1024 * 1024:
            return tq
    return 0  # does not fit — use the XLA path


def _bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, *, inner: int, eps: float):
    """dx of ``out = x + W2·geglu(LN(x)W1 + b1)`` for one [tq, C] tile.

    Recomputes the forward intermediates in VMEM (cheaper than saving the
    [*, 2*4C] activations to HBM) and runs the LN/GEGLU chain backward.
    Parameter gradients are NOT computed here — the XLA expressions in
    ``_bwd`` cover them and are dead-code-eliminated in adapter-only
    training, where every FF weight is frozen."""

    xt = x_ref[0]                      # [tq, C] input dtype
    gt32 = g_ref[0].astype(jnp.float32)
    xf = xt.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    nhat = xc * rstd
    scale = lns_ref[0].astype(jnp.float32)
    xn = (nhat * scale + lnb_ref[0].astype(jnp.float32)).astype(xt.dtype)

    h = jax.lax.dot_general(
        xn, w1_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)  # [tq, 2F]
    a = jax.lax.slice_in_dim(h, 0, inner, axis=1)
    gate = jax.lax.slice_in_dim(h, inner, 2 * inner, axis=1)
    phi = 0.5 * (1.0 + _erf(gate * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * gate * gate) * 0.3989422804014327  # N(0,1) density

    # gh = g @ W2^T  (contract C with W2's output dim)
    gh = jax.lax.dot_general(
        g_ref[0], w2_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tq, F]
    ga = gh * (gate * phi)             # d/d a
    ggate = gh * a * (phi + gate * pdf)  # d/d gate (exact-gelu derivative)
    gy1 = jnp.concatenate([ga, ggate], axis=1).astype(xt.dtype)
    gxn = jax.lax.dot_general(         # gy1 @ W1^T
        gy1, w1_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tq, C]

    gn = gxn * scale
    m1 = jnp.mean(gn, axis=-1, keepdims=True)
    m2 = jnp.mean(gn * nhat, axis=-1, keepdims=True)
    dx = rstd * (gn - m1 - nhat * m2) + gt32  # + residual path
    dx_ref[0] = dx.astype(dx_ref.dtype)


def fused_ln_geglu_ff_bwd_dx(
    x: jnp.ndarray, grad: jnp.ndarray, ln_scale, ln_bias, w1, b1, w2,
    eps: float = 1e-5, tile_q: int = 128, interpret: bool = False,
) -> jnp.ndarray:
    """Input gradient of fused_ln_geglu_ff (one kernel, recompute-in-VMEM)."""

    b, s, c = x.shape
    inner = w2.shape[0]
    tile_q = pick_tile_q(s, min(tile_q, _round_up(s, 64)))
    sp = _round_up(s, tile_q)
    if sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        grad = jnp.pad(grad, ((0, 0), (0, sp - s), (0, 0)))
    dt = x.dtype
    cast = lambda a: jnp.asarray(a, dt)

    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, inner=inner, eps=eps),
        grid=(b, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * inner), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, c), grad.dtype),
        interpret=interpret,
    )(x, cast(grad), cast(ln_scale).reshape(1, c), cast(ln_bias).reshape(1, c),
      cast(w1), cast(b1).reshape(1, 2 * inner), cast(w2))
    return dx[:, :s]


def ff_bwd_tile_q(s: int, c: int, inner: int) -> int:
    """Largest bwd tile within ~12 MB VMEM (more fp32 live activations than
    the forward: h, gh, gy1 tiles)."""

    w_bytes = (c * 2 * inner + inner * c) * 2
    for tq in (256, 128, 64):
        act = tq * (2 * inner * 4 * 2 + inner * 4 + 6 * c * 4)
        if w_bytes + act <= 12 * 1024 * 1024:
            return tq
    return 0


def _xla_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h = xn @ w1 + b1
    a, g = jnp.split(h, 2, axis=-1)
    y = a * jax.nn.gelu(g, approximate=False)
    return x + (y @ w2 + b2).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_geglu_ff_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float):
    return fused_ln_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    out = fused_ln_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _bwd(eps, res, grad):
    """dx from the Pallas bwd kernel; parameter grads as plain-XLA
    expressions. In adapter-only training every FF parameter is frozen, so
    XLA dead-code-eliminates the whole parameter-grad subgraph and only the
    one fused dx kernel runs — that asymmetry is the point of splitting."""

    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: _xla_reference(*a, eps), *res)
    dx_xla, dls, dlb, dw1, db1, dw2, db2 = vjp(grad)
    b, s, c = x.shape
    inner = w2.shape[0]
    tq = ff_bwd_tile_q(s, c, inner)
    from ap_adapter_tpu.ops.attention import _on_tpu

    if tq > 0 and _on_tpu():
        dx = fused_ln_geglu_ff_bwd_dx(
            x, grad, ln_scale, ln_bias, w1, b1, w2, eps=eps, tile_q=tq)
    else:
        dx = dx_xla
    return dx, dls, dlb, dw1, db1, dw2, db2


fused_ln_geglu_ff_vjp.defvjp(_fwd, _bwd)
