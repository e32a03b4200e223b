"""Fused LN+GEGLU feed-forward kernel vs the unfused module math
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from ap_adapter_tpu.ops import pallas_fused_ff as pff


def _unfused(x, ln_s, ln_b, w1, b1, w2, b2):
    y = nn.LayerNorm(epsilon=1e-5).apply({"params": {"scale": ln_s, "bias": ln_b}}, x)
    h = y @ w1 + b1
    a, g = jnp.split(h, 2, axis=-1)
    return x + (a * nn.gelu(g, approximate=False)) @ w2 + b2


@pytest.mark.parametrize("shape,inner", [
    ((2, 100, 256), 1024),   # hot-site layout, padded rows
    ((1, 64, 128), 512),     # exact tile
])
def test_fused_ff_matches_unfused(rng, shape, inner):
    b, s, c = shape
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((c, 2 * inner)) / np.sqrt(c)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(2 * inner).astype(np.float32) * 0.1)
    w2 = jnp.asarray((rng.standard_normal((inner, c)) / np.sqrt(inner)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)

    want = np.asarray(_unfused(x, ln_s, ln_b, w1, b1, w2, b2))
    got = np.asarray(pff.fused_ln_geglu_ff(
        x, ln_s, ln_b, w1, b1, w2, b2, tile_q=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_ff_grads(rng):
    b, s, c, inner = 1, 32, 128, 256

    # inner=256 violates none of the constraints for the XLA ref; kernel
    # interpret mode only needs 128-multiples, which 256 satisfies
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s, ln_b = jnp.ones(c), jnp.zeros(c)
    w1 = jnp.asarray((rng.standard_normal((c, 2 * inner)) / np.sqrt(c)).astype(np.float32))
    b1 = jnp.zeros(2 * inner)
    w2 = jnp.asarray((rng.standard_normal((inner, c)) / np.sqrt(inner)).astype(np.float32))
    b2 = jnp.zeros(c)

    orig = pff.fused_ln_geglu_ff
    pff.fused_ln_geglu_ff = lambda *a, **k: orig(*a, **{**k, "tile_q": 32, "interpret": True})
    try:
        g1 = jax.grad(lambda x: jnp.sum(
            pff.fused_ln_geglu_ff_vjp(x, ln_s, ln_b, w1, b1, w2, b2, 1e-5) ** 2))(x)
    finally:
        pff.fused_ln_geglu_ff = orig
    g2 = jax.grad(lambda x: jnp.sum(
        pff._xla_reference(x, ln_s, ln_b, w1, b1, w2, b2, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_ff_tile_q_guard():
    assert pff.ff_tile_q(1000, 256, 1024) == 256
    assert pff.ff_tile_q(64, 640, 2560) > 0     # largest UNet width fits
    assert pff.ff_tile_q(64, 4096, 16384) == 0  # absurd width -> XLA path


def test_bwd_dx_kernel_matches_autodiff(rng):
    """Pallas backward dx kernel (recompute-in-VMEM) vs jax.grad through the
    unfused reference, including LN statistics backprop and the residual."""

    b, s, c, inner = 2, 100, 128, 512
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    w1 = jnp.asarray((rng.standard_normal((c, 2 * inner)) / np.sqrt(c)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(2 * inner).astype(np.float32) * 0.1)
    w2 = jnp.asarray((rng.standard_normal((inner, c)) / np.sqrt(inner)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))

    want = jax.grad(lambda x: jnp.sum(
        pff._xla_reference(x, ln_s, ln_b, w1, b1, w2, b2, 1e-5) * ct))(x)
    got = pff.fused_ln_geglu_ff_bwd_dx(
        x, ct, ln_s, ln_b, w1, b1, w2, eps=1e-5, tile_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_vjp_routes_bwd_kernel_on_tpu(rng, monkeypatch):
    """With _on_tpu patched true + interpret-mode kernels, the custom VJP's
    dx comes from the Pallas bwd kernel and matches autodiff; parameter
    grads (XLA expressions) stay correct."""

    from ap_adapter_tpu.ops import attention as attn_mod

    b, s, c, inner = 1, 48, 128, 256
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s, ln_b = jnp.ones(c), jnp.zeros(c)
    w1 = jnp.asarray((rng.standard_normal((c, 2 * inner)) / np.sqrt(c)).astype(np.float32))
    b1 = jnp.zeros(2 * inner)
    w2 = jnp.asarray((rng.standard_normal((inner, c)) / np.sqrt(inner)).astype(np.float32))
    b2 = jnp.zeros(c)

    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    orig_fwd = pff.fused_ln_geglu_ff
    orig_bwd = pff.fused_ln_geglu_ff_bwd_dx
    monkeypatch.setattr(pff, "fused_ln_geglu_ff",
                        lambda *a, **k: orig_fwd(*a, **{**k, "tile_q": 32, "interpret": True}))
    monkeypatch.setattr(pff, "fused_ln_geglu_ff_bwd_dx",
                        lambda *a, **k: orig_bwd(*a, **{**k, "tile_q": 32, "interpret": True}))

    def loss(x, w1, w2):
        return jnp.sum(pff.fused_ln_geglu_ff_vjp(x, ln_s, ln_b, w1, b1, w2, b2, 1e-5) ** 2)

    gx, gw1, gw2 = jax.grad(loss, argnums=(0, 1, 2))(x, w1, w2)
    gx_ref, gw1_ref, gw2_ref = jax.grad(
        lambda x, w1, w2: jnp.sum(
            pff._xla_reference(x, ln_s, ln_b, w1, b1, w2, b2, 1e-5) ** 2),
        argnums=(0, 1, 2))(x, w1, w2)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw1_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw2_ref), rtol=2e-4, atol=2e-4)
