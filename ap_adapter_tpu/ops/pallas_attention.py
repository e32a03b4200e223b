"""Fused decoupled dual-KV cross-attention as a Pallas TPU kernel.

One kernel computes both attention branches of the adapter —
softmax(qK_t^T)V_t + s * softmax(qK_a^T)V_a — in a single pass over the
query tile: q is read from HBM once and both probability matrices live only
in VMEM, instead of the two separate attention chains (4 matmuls + 2
softmaxes with HBM round-trips between them) the XLA path emits.

Adapter workload shapes (audioldm2-large): queries are latent pixels
(64-1000 per level), keys are tiny (8 GPT-2 tokens; 8-512 pooled AudioMAE
tokens), head_dim in {32, 48, 80}. Everything is padded to (8,128) tiles in
the wrapper; key padding is masked with -inf before the softmax.
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


def _kernel(scale_ref, q_ref, kt_ref, vt_ref, ki_ref, vi_ref, o_ref, *, st: int, si: int, sm_scale: float):
    """Grid: (BH, num_q_tiles). Blocks: q/o [1, TILE_Q, Dp]; k/v [1, S*_pad, Dp]."""

    q = q_ref[0].astype(jnp.float32)

    def branch(k_ref, v_ref, valid):
        k = k_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [TILE_Q, S_pad]
        if valid < logits.shape[-1]:  # static: mask only when padded
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < valid, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jax.lax.dot_general(
            p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = branch(kt_ref, vt_ref, st)
    out = out + scale_ref[0, 0] * branch(ki_ref, vi_ref, si)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_dual_kv_attention(
    q: jnp.ndarray,  # [B, Sq, H, D]
    k_text: jnp.ndarray,  # [B, St, H, D]
    v_text: jnp.ndarray,
    k_ip: jnp.ndarray,  # [B, Si, H, D]
    v_ip: jnp.ndarray,
    ip_scale,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decoupled dual-KV attention (unmasked text branch — the adapter path
    never receives a mask, see models/unet_blocks.CrossAttention)."""

    b, sq, h, d = q.shape
    st, si = k_text.shape[1], k_ip.shape[1]
    dtype = q.dtype
    sm_scale = float(d) ** -0.5

    dp = _round_up(d, 128)
    sqp = _round_up(sq, tile_q)
    stp = _round_up(st, 128)
    sip = _round_up(si, 128)

    def to_bh(x, s_pad):
        # [B, S, H, D] -> [B*H, S_pad, Dp]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        return jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, dp - d)))

    qp = to_bh(q, sqp)
    ktp = to_bh(k_text, stp)
    vtp = to_bh(v_text, stp)
    kip = to_bh(k_ip, sip)
    vip = to_bh(v_ip, sip)
    scale = jnp.asarray(ip_scale, jnp.float32).reshape(1, 1)

    grid = (b * h, sqp // tile_q)
    out = pl.pallas_call(
        functools.partial(_kernel, st=st, si=si, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_q, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sip, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sip, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, dp), dtype),
        interpret=interpret,
    )(scale, qp, ktp, vtp, kip, vip)

    out = out[:, :sq, :d].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
