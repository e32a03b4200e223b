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
