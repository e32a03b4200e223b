"""int8 W8A8 serving kernels vs the fp32 module math (interpret mode).

Quantized kernels cannot be bit-compared; the contract is an error class:
W8A8 with per-row dynamic activation scales measures ~1.3% relative error
per matmul on Gaussian data (~2.6% through the two chained FF matmuls +
GELU) — roughly one mantissa bit worse than bf16 rounding (0.4%/op). The
end-to-end gate for the serving mode is the bf16-vs-int8 mel comparison in
docs/PERF.md, not these per-kernel bounds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from ap_adapter_tpu.ops import pallas_int8 as pi8
from ap_adapter_tpu.ops.attention import sdpa

pytestmark = pytest.mark.quick


def _rel(got, want):
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)


def _ff_ref(x, ln_s, ln_b, w1, b1, w2, b2, eps):
    y = nn.LayerNorm(epsilon=eps).apply({"params": {"scale": ln_s, "bias": ln_b}}, x)
    h = y @ w1 + b1
    a, g = jnp.split(h, 2, axis=-1)
    return x + (a * jax.nn.gelu(g, approximate=False)) @ w2 + b2


def _attn_ref(x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, eps):
    b, s, c = x.shape
    d = c // heads
    y = nn.LayerNorm(epsilon=eps).apply({"params": {"scale": ln_s, "bias": ln_b}}, x)
    q = (y @ wq).reshape(b, s, heads, d)
    k = (y @ wk).reshape(b, s, heads, d)
    v = (y @ wv).reshape(b, s, heads, d)
    return x + sdpa(q, k, v).reshape(b, s, c) @ wo + bo


@pytest.mark.parametrize("shape,inner", [
    ((2, 100, 256), 1024),
    ((1, 64, 384), 1536),
])
def test_ff_int8_error_class(rng, shape, inner):
    b, s, c = shape
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((c, 2 * inner)) / np.sqrt(c)).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.standard_normal(2 * inner).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((inner, c)) / np.sqrt(inner)).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))

    want = np.asarray(_ff_ref(x, ln_s, ln_b, w1, b1, w2, b2, 1e-5))
    w1q, s1 = pi8.quantize_weight(w1)
    w2q, s2 = pi8.quantize_weight(w2)
    got = np.asarray(pi8.fused_ln_geglu_ff_int8(
        x, ln_s, ln_b, w1q, s1, b1, w2q, s2, b2, eps=1e-5, tile_q=64,
        interpret=True))
    # residual passthrough is exact; the ff branch carries the quant error
    branch_rel = _rel(got - np.asarray(x), want - np.asarray(x))
    assert branch_rel < 0.035, branch_rel


@pytest.mark.parametrize("shape,heads", [
    ((2, 100, 256), 8),   # hot-site layout (d=32, 2 lane groups)
    ((2, 60, 384), 8),    # d=48 -> padded 64
    ((1, 64, 640), 8),    # d=80 -> padded 128
])
def test_attn_int8_error_class(rng, shape, heads):
    b, s, c = shape
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    ws = [jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
          for _ in range(4)]
    bo = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))

    want = np.asarray(_attn_ref(x, ln_s, ln_b, *ws, bo, heads, 1e-5))
    wq8, sq, wk_p, wv_p, wo8, so = pi8.quantize_attention_weights(*ws, heads)
    got = np.asarray(pi8.fused_ln_self_attention_int8(
        x, ln_s, ln_b, wq8, sq, wk_p, wv_p, wo8, so, bo, heads, eps=1e-5,
        tile_q=64, interpret=True))
    branch_rel = _rel(got - np.asarray(x), want - np.asarray(x))
    assert branch_rel < 0.03, branch_rel


def test_attn_int8_diffuse_probs_keep_mass(rng):
    """The design constraint the bf16-PV decision protects: near-uniform
    attention rows (probs ~1/S, all below the int8 grid's 1/254 step) must
    not lose their numerator mass. Tiny Q makes softmax nearly uniform."""

    b, s, c, heads = 1, 256, 128, 4
    x = jnp.asarray(0.01 * rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.ones(c, jnp.float32)
    ln_b = jnp.zeros(c, jnp.float32)
    ws = [jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
          for _ in range(4)]
    bo = jnp.zeros(c, jnp.float32)

    want = np.asarray(_attn_ref(x, ln_s, ln_b, *ws, bo, heads, 1e-5))
    wq8, sq, wk_p, wv_p, wo8, so = pi8.quantize_attention_weights(*ws, heads)
    got = np.asarray(pi8.fused_ln_self_attention_int8(
        x, ln_s, ln_b, wq8, sq, wk_p, wv_p, wo8, so, bo, heads, eps=1e-5,
        tile_q=64, interpret=True))
    assert _rel(got - np.asarray(x), want - np.asarray(x)) < 0.03


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
    w8, scale = pi8.quantize_weight(w)
    assert w8.dtype == jnp.int8 and scale.shape == (1, 256)
    back = np.asarray(w8, np.float32) * np.asarray(scale)
    assert _rel(back, np.asarray(w)) < 0.01


def _cross_ref(x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
               wki=None, wvi=None, ip_scale=0.0, num_ip=8, mask_bias=None):
    b, s, c = x.shape
    d = c // heads
    y = nn.LayerNorm(epsilon=1e-5).apply({"params": {"scale": ln_s, "bias": ln_b}}, x)
    q = (y @ wq).reshape(b, s, heads, d)
    ctx_t = ctx[:, :num_ip] if wki is not None else ctx
    k = (ctx_t @ wk).reshape(b, -1, heads, d)
    v = (ctx_t @ wv).reshape(b, -1, heads, d)
    mb = None
    if mask_bias is not None:
        mb = mask_bias[:, None, None, :]
    out = sdpa(q, k, v, mask=mb).reshape(b, s, c)
    if wki is not None:
        ki = (ctx[:, num_ip:] @ wki).reshape(b, -1, heads, d)
        vi = (ctx[:, num_ip:] @ wvi).reshape(b, -1, heads, d)
        out = out + ip_scale * sdpa(q, ki, vi).reshape(b, s, c)
    return x + out @ wo + bo


@pytest.mark.parametrize("adapter", [False, True])
def test_cross_int8_error_class(rng, adapter):
    b, s, c, heads, dc = 2, 100, 256, 8, 768
    sk = 72 if adapter else 64
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((b, sk, dc)).astype(np.float32))
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    wq = jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((dc, c)) / np.sqrt(dc)).astype(np.float32))
    wv = jnp.asarray((rng.standard_normal((dc, c)) / np.sqrt(dc)).astype(np.float32))
    wo = jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
    bo = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    wki = wvi = None
    ip_scale = 0.0
    if adapter:
        wki = jnp.asarray((rng.standard_normal((dc, c)) / np.sqrt(dc)).astype(np.float32))
        wvi = jnp.asarray((rng.standard_normal((dc, c)) / np.sqrt(dc)).astype(np.float32))
        ip_scale = 0.5

    want = np.asarray(_cross_ref(x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo,
                                 heads, wki, wvi, ip_scale))
    wq8, sq, wk_p, wv_p, wo8, so = pi8.quantize_attention_weights(
        wq, wk, wv, wo, heads)
    got = np.asarray(pi8.fused_ln_cross_attention_int8(
        x, ctx, ln_s, ln_b, wq8, sq, wk_p, wv_p, wo8, so, bo, heads,
        wk_ip=wki, wv_ip=wvi, ip_scale=ip_scale, num_ip_tokens=8,
        tile_q=64, interpret=True))
    assert _rel(got - np.asarray(x), want - np.asarray(x)) < 0.03
