"""Single-pass self-attention Pallas kernel for moderate sequence lengths.

The UNet's hot self-attention sites (S=1000, head_dim 32) fit their ENTIRE
K/V in VMEM, so no flash-style KV blocking is needed: one kernel computes
logits, softmax and PV per query tile entirely on-chip. The XLA path makes
three HBM passes over the [B,H,S,S] logits tensor (write logits+max, read for
exp-sum, read for normalize+PV — profiled at ~1.1 ms/site at S=1000,
B*H=128); this kernel reads q/k/v once and writes the output once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid: int, sm_scale: float):
    # matmul inputs stay in the input dtype (bf16 in the served pipeline):
    # converting to fp32 first forces the MXU into its multi-pass fp32 mode.
    # Accumulation is fp32 via preferred_element_type either way.
    q = q_ref[0]  # [BQ, Dp]
    k = k_ref[0]  # [Sp, Dp]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # [BQ, Sp]
    if s_valid < logits.shape[-1]:  # static: mask only when S was padded
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < s_valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # normalize the [BQ, Dp] output instead of the [BQ, Sp] probabilities
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def pallas_self_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unmasked self-attention; K/V held fully in VMEM per (batch*head)."""

    b, s, h, d = q.shape
    dtype = q.dtype
    sm_scale = float(d) ** -0.5

    dp = _round_up(d, 128)
    sp = _round_up(s, tile_q)

    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, dp - d)))

    qp, kp, vp = to_bh(q), to_bh(k), to_bh(v)

    out = pl.pallas_call(
        functools.partial(_kernel, s_valid=s, sm_scale=sm_scale),
        grid=(b * h, sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, dp), dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :s, :d].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, XLA backward (training path)
# ---------------------------------------------------------------------------


def _xla_reference(q, k, v):
    """Mathematically identical XLA formulation (for the backward pass)."""

    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    probs = jax.nn.softmax(logits * (float(d) ** -0.5), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def pallas_self_attention_vjp(q, k, v):
    """pallas_self_attention with reverse-mode support: the adapter trainer
    differentiates through every UNet activation even though only adapter
    grads are kept, so the kernel needs a VJP; the backward pass reuses the
    XLA attention (correct, and training-only)."""

    return pallas_self_attention(q, k, v, tile_q=512)


def _fwd(q, k, v):
    return pallas_self_attention(q, k, v, tile_q=512), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


pallas_self_attention_vjp.defvjp(_fwd, _bwd)
