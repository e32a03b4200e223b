"""Fused LN+self-attention block kernel vs the unfused module math
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from ap_adapter_tpu.ops import pallas_fused_block as pfb
from ap_adapter_tpu.ops.attention import sdpa


def _unfused(x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, eps):
    """Exactly what BasicTransformerBlock does today: nn.LayerNorm ->
    Dense q/k/v -> sdpa -> Dense out -> residual."""

    b, s, c = x.shape
    d = c // heads
    y = nn.LayerNorm(epsilon=eps).apply({"params": {"scale": ln_s, "bias": ln_b}}, x)
    q = (y @ wq).reshape(b, s, heads, d)
    k = (y @ wk).reshape(b, s, heads, d)
    v = (y @ wv).reshape(b, s, heads, d)
    out = sdpa(q, k, v).reshape(b, s, c)
    return x + out @ wo + bo


@pytest.mark.parametrize("shape,heads", [
    ((2, 100, 256), 8),   # hot-site layout (2 lane groups x 4 packed heads)
    ((1, 70, 128), 4),    # single lane group, d=32
    ((1, 40, 128), 2),    # d=64, g=2
])
def test_fused_block_matches_unfused(rng, shape, heads):
    b, s, c = shape
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ws = [jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
          for _ in range(4)]
    bo = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    want = np.asarray(_unfused(x, ln_s, ln_b, *ws, bo, heads, 1e-5))
    got = np.asarray(pfb.fused_ln_self_attention(
        x, ln_s, ln_b, *ws, bo, heads, eps=1e-5, tile_q=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_block_grads(rng):
    b, s, c, heads = 1, 32, 128, 4
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.ones(c)
    ln_b = jnp.zeros(c)
    ws = [jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
          for _ in range(4)]
    bo = jnp.zeros(c)

    orig = pfb.fused_ln_self_attention
    pfb.fused_ln_self_attention = lambda *a, **k: orig(*a, **{**k, "tile_q": 32, "interpret": True})
    try:
        g1 = jax.grad(lambda x: jnp.sum(
            pfb.fused_ln_self_attention_vjp(x, ln_s, ln_b, *ws, bo, heads, 1e-5) ** 2))(x)
    finally:
        pfb.fused_ln_self_attention = orig
    g2 = jax.grad(lambda x: jnp.sum(
        pfb._xla_reference(x, ln_s, ln_b, *ws, bo, heads, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
