"""Fused dual-KV Pallas kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ap_adapter_tpu.ops.attention import dual_kv_attention
from ap_adapter_tpu.ops.pallas_attention import fused_dual_kv_attention


@pytest.mark.parametrize("shape", [
    # (B, Sq, H, D, St, Si) — adapter-realistic: tiny keys, odd head dims
    (2, 64, 2, 32, 8, 128),
    (1, 100, 4, 48, 8, 32),
    (1, 256, 1, 80, 8, 512),
])
def test_fused_matches_xla(rng, shape):
    b, sq, h, d, st, si = shape
    q = rng.standard_normal((b, sq, h, d)).astype(np.float32)
    kt = rng.standard_normal((b, st, h, d)).astype(np.float32)
    vt = rng.standard_normal((b, st, h, d)).astype(np.float32)
    ki = rng.standard_normal((b, si, h, d)).astype(np.float32)
    vi = rng.standard_normal((b, si, h, d)).astype(np.float32)

    want = np.asarray(dual_kv_attention(
        jnp.asarray(q), jnp.asarray(kt), jnp.asarray(vt),
        jnp.asarray(ki), jnp.asarray(vi), 0.7,
    ))
    got = np.asarray(fused_dual_kv_attention(
        jnp.asarray(q), jnp.asarray(kt), jnp.asarray(vt),
        jnp.asarray(ki), jnp.asarray(vi), 0.7,
        tile_q=128, interpret=True,
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 64, 2, 32), (1, 100, 4, 48)])
def test_pallas_self_attention_matches_xla(rng, shape):
    from ap_adapter_tpu.ops.pallas_self_attention import pallas_self_attention

    b, s, h, d = shape
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    want = np.asarray(dual_kv_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(k), jnp.asarray(v), 0.0,
    ))
    got = np.asarray(pallas_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tile_q=128, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [
    (2, 100, 8, 32),   # UNet hot site layout (G=4 heads packed)
    (1, 70, 4, 64),    # G=2
    (1, 130, 8, 16),   # G=8
])
def test_packed_self_attention_matches_xla(rng, shape):
    from ap_adapter_tpu.ops.pallas_packed_attention import packed_self_attention

    b, s, h, d = shape
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    want = np.asarray(dual_kv_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(k), jnp.asarray(v), 0.0,
    ))
    got = np.asarray(packed_self_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), tile_q=64, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_self_attention_vjp_grads(rng):
    """Gradient through the packed kernel's custom VJP matches XLA."""

    import jax
    from ap_adapter_tpu.ops import pallas_packed_attention as ppa

    b, s, h, d = 1, 32, 4, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))

    orig = ppa.packed_self_attention
    ppa.packed_self_attention = lambda q, k, v, tile_q=256: orig(
        q, k, v, tile_q=32, interpret=True)
    try:
        g1 = jax.grad(lambda q: jnp.sum(ppa.packed_self_attention_vjp(q, k, v) ** 2))(q)
    finally:
        ppa.packed_self_attention = orig
    g2 = jax.grad(lambda q: jnp.sum(ppa._xla_reference(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_pallas_self_attention_vjp_grads(rng):
    """Gradient through the custom-VJP wrapper matches XLA attention grads."""

    import jax
    from ap_adapter_tpu.ops import pallas_self_attention as psa

    b, s, h, d = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))

    # forward uses interpret-mode pallas on CPU
    orig = psa.pallas_self_attention
    psa_interp = lambda q, k, v, tile_q=256: orig(q, k, v, tile_q=128, interpret=True)
    psa.pallas_self_attention = psa_interp
    try:
        g1 = jax.grad(lambda q: jnp.sum(psa.pallas_self_attention_vjp(q, k, v) ** 2))(q)
    finally:
        psa.pallas_self_attention = orig
    g2 = jax.grad(lambda q: jnp.sum(psa._xla_reference(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
