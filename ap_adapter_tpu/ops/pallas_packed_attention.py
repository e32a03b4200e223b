"""Head-packed single-pass self-attention Pallas kernel.

The UNet's hot self-attention sites (reference modeling_audioldm2.py
Transformer2DModel attn1 at 1000 tokens; 8 heads, head_dim 32) have head_dim
well below the TPU's 128-lane width. The generic whole-KV kernel
(ops/pallas_self_attention.py) pads head_dim -> 128 in HBM, quadrupling
q/k/v/out HBM traffic and VMEM footprint.

This kernel packs G = 128 // head_dim heads into the lane dimension:

* K and V are stored packed ``[B*H/G, S, G*D]`` — one VMEM-resident copy
  serves G heads (G x less HBM traffic and VMEM).
* Q K^T for all packed heads is ONE full-lane matmul using a "staircase"
  query block: the [tile_q, 128] packed query tile is replicated G times
  along rows, with block g lane-masked to its own head's lanes. Row block g
  of the [G*tile_q, S] logits is then exactly head g's logits (cross-head
  lane products are zeroed by the mask). MXU cost is identical to the
  padded formulation (the systolic array charges a full 128-contraction
  either way), but there are no sub-128 lane slices, so Mosaic needs no
  relayouts.
* P V is one [G*tile_q, S] x [S, G*D] matmul; head g's true output is the
  diagonal block (rows g, lanes g), extracted with lane masks and summed.
* Matmul inputs stay in bf16 (fp32 accumulation via
  ``preferred_element_type``) — converting to fp32 first would force the
  MXU into the multi-pass fp32 path.
* The softmax denominator is applied to the [G*tile_q, G*D] output instead
  of the [G*tile_q, S] probability matrix (S/(G*D) x fewer divides).
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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, g: int, d: int, s_valid: int):
    tq = q_ref.shape[1]
    q = q_ref[0]  # [tq, G*D] packed heads, bf16, pre-scaled by sm_scale
    k = k_ref[0]  # [Sp, G*D]
    v = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, g * d), 1)
    # staircase: block i of rows carries head i's lanes only
    qs = jnp.concatenate(
        [jnp.where((lane >= i * d) & (lane < (i + 1) * d), q, 0) for i in range(g)],
        axis=0,
    )  # [G*tq, G*D]

    logits = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [G*tq, Sp]; row block i == head i's logits
    if s_valid < logits.shape[-1]:  # static: mask only when S was padded
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < s_valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    o_full = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom  # [G*tq, G*D]; head i's output = rows i, lanes i

    lane_o = jax.lax.broadcasted_iota(jnp.int32, (tq, g * d), 1)
    out = jnp.zeros((tq, g * d), jnp.float32)
    for i in range(g):
        blk = jax.lax.slice_in_dim(o_full, i * tq, (i + 1) * tq, axis=0)
        out = out + jnp.where((lane_o >= i * d) & (lane_o < (i + 1) * d), blk, 0)
    o_ref[0] = out.astype(o_ref.dtype)


def packed_self_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    tile_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unmasked self-attention with G = 128 // D heads packed per kernel
    instance. Requires D to divide 128 and H to be a multiple of G
    (callers route other shapes to the generic paths)."""

    b, s, h, d = q.shape
    assert LANES % d == 0 and d <= LANES
    g = LANES // d
    assert h % g == 0, (h, g)
    dtype = q.dtype
    sm_scale = float(d) ** -0.5
    sp = _round_up(s, tile_q)

    def pack(x):
        # [B,S,H,D] -> [B, H/G, S, G*D]: lanes = (head-in-group, head_dim)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, h // g, g, s, d)
        x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b * (h // g), s, g * d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    # fold the softmax scale into q host-side: one [S, 128] multiply here
    # instead of a [G*tile_q, S] multiply on every logits tile in-kernel
    qp = pack(q * jnp.asarray(sm_scale, q.dtype))
    kp, vp = pack(k), pack(v)

    out = pl.pallas_call(
        functools.partial(_kernel, g=g, d=d, s_valid=s),
        grid=(b * (h // g), sp // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, g * d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, g * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, g * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, g * d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * (h // g), sp, g * d), dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :s].reshape(b, h // g, s, g, d)
    out = jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, XLA backward (training path)
# ---------------------------------------------------------------------------


def _xla_reference(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    probs = jax.nn.softmax(logits * (float(d) ** -0.5), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def packed_self_attention_vjp(q, k, v):
    return packed_self_attention(q, k, v)


def _fwd(q, k, v):
    return packed_self_attention(q, k, v), (q, k, v)


def _bwd(res, grad):
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(grad)


packed_self_attention_vjp.defvjp(_fwd, _bwd)
