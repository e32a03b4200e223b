"""Fused LN+cross-attention block kernel vs the unfused module math
(interpret mode on CPU): plain cross (with mask), and dual-KV adapter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ap_adapter_tpu.ops import pallas_fused_cross as pfc


def _mk(rng, *shape, scale=1.0):
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


@pytest.mark.parametrize("b,s,c,heads,sk,dc", [
    (2, 100, 256, 8, 64, 48),   # T5-style site
    (1, 70, 128, 4, 12, 32),
    (1, 60, 384, 8, 24, 48),    # d=48 -> padded-head layout (64)
    (1, 64, 640, 8, 16, 48),    # d=80 -> padded-head layout (128)
])
@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_cross_plain(rng, b, s, c, heads, sk, dc, with_mask):
    x = _mk(rng, b, s, c)
    ctx = _mk(rng, b, sk, dc)
    ln_s, ln_b = _mk(rng, c), _mk(rng, c)
    wq, wo = _mk(rng, c, c, scale=c ** -0.5), _mk(rng, c, c, scale=c ** -0.5)
    wk, wv = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    bo = _mk(rng, c, scale=0.1)
    mask = None
    if with_mask:
        mask = jnp.asarray(
            np.where(rng.random((b, sk)) < 0.3, -10000.0, 0.0).astype(np.float32))

    want = np.asarray(pfc._xla_reference(
        x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
        None, None, 0.0, 8, mask, 1e-5))
    got = np.asarray(pfc.fused_ln_cross_attention(
        x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
        mask_bias=mask, tile_q=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_cross_dual_kv(rng):
    """Adapter site: first 8 context rows -> text KV, rest -> audio KV,
    combined as text + scale * audio (reference attention_processor.py
    :400-454)."""

    b, s, c, heads, dc = 2, 100, 256, 8, 48
    n_ip, sk = 8, 8 + 20
    x = _mk(rng, b, s, c)
    ctx = _mk(rng, b, sk, dc)
    ln_s, ln_b = _mk(rng, c), _mk(rng, c)
    wq, wo = _mk(rng, c, c, scale=c ** -0.5), _mk(rng, c, c, scale=c ** -0.5)
    wk, wv = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    wki, wvi = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    bo = _mk(rng, c, scale=0.1)

    want = np.asarray(pfc._xla_reference(
        x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
        wki, wvi, 0.7, n_ip, None, 1e-5))
    got = np.asarray(pfc.fused_ln_cross_attention(
        x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
        wk_ip=wki, wv_ip=wvi, ip_scale=0.7, num_ip_tokens=n_ip,
        tile_q=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_cross_grads(rng):
    b, s, c, heads, dc, sk = 1, 64, 128, 4, 32, 8 + 12
    x = _mk(rng, b, s, c)
    ctx = _mk(rng, b, sk, dc)
    ln_s, ln_b = jnp.ones(c), jnp.zeros(c)
    wq, wo = _mk(rng, c, c, scale=c ** -0.5), _mk(rng, c, c, scale=c ** -0.5)
    wk, wv = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    wki, wvi = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    bo = jnp.zeros(c)

    orig = pfc.fused_ln_cross_attention
    pfc.fused_ln_cross_attention = lambda *a, **k: orig(
        *a, **{**k, "tile_q": 32, "interpret": True})
    try:
        g1 = jax.grad(lambda wki_: jnp.sum(pfc.fused_ln_cross_attention_vjp(
            x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
            wki_, wvi, 0.7, 8, None, 1e-5) ** 2))(wki)
    finally:
        pfc.fused_ln_cross_attention = orig
    g2 = jax.grad(lambda wki_: jnp.sum(pfc._xla_reference(
        x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
        wki_, wvi, 0.7, 8, None, 1e-5) ** 2))(wki)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_bwd_kernel_plain_cross(rng, with_mask):
    """Pallas cross bwd dx vs autodiff through the unfused reference."""

    b, s, c, heads, sk, dc = 2, 100, 256, 8, 24, 48
    x = _mk(rng, b, s, c)
    ctx = _mk(rng, b, sk, dc)
    ln_s, ln_b = _mk(rng, c), _mk(rng, c, scale=0.1)
    wq, wo = _mk(rng, c, c, scale=c ** -0.5), _mk(rng, c, c, scale=c ** -0.5)
    wk, wv = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    bo = _mk(rng, c, scale=0.1)
    ct = _mk(rng, b, s, c)
    mask = None
    if with_mask:
        mask = jnp.asarray(
            np.where(rng.random((b, sk)) < 0.3, -10000.0, 0.0).astype(np.float32))

    want = jax.grad(lambda x: jnp.sum(pfc._xla_reference(
        x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
        None, None, 0.0, 8, mask, 1e-5) * ct))(x)
    dx, dki, dvi = pfc.fused_ln_cross_attention_bwd(
        x, ct, ctx, ln_s, ln_b, wq, wk, wv, wo, heads,
        mask_bias=mask, eps=1e-5, tile_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert dki.shape[1] == 0 and dvi.shape[1] == 0


@pytest.mark.parametrize("c,heads", [
    (256, 8),   # aligned d=32
    (384, 8),   # d=48 -> padded-head layout (adapter grads unpadded back)
])
def test_bwd_kernel_dual_kv_adapter_grads(rng, c, heads):
    """Adapter site bwd: dx AND the to_k_ip/to_v_ip weight grads (via the
    kernel's per-position dki/dvi + the XLA einsum) vs autodiff."""

    b, s, dc = 2, 100, 48
    n_ip, sk = 8, 8 + 20
    scale = 0.55
    x = _mk(rng, b, s, c)
    ctx = _mk(rng, b, sk, dc)
    ln_s, ln_b = _mk(rng, c), _mk(rng, c, scale=0.1)
    wq, wo = _mk(rng, c, c, scale=c ** -0.5), _mk(rng, c, c, scale=c ** -0.5)
    wk, wv = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    wki, wvi = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    bo = _mk(rng, c, scale=0.1)
    ct = _mk(rng, b, s, c)

    def ref(x, wki, wvi):
        return jnp.sum(pfc._xla_reference(
            x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
            wki, wvi, scale, n_ip, None, 1e-5) * ct)

    want_dx, want_dwki, want_dwvi = jax.grad(ref, argnums=(0, 1, 2))(x, wki, wvi)

    dx, dki, dvi = pfc.fused_ln_cross_attention_bwd(
        x, ct, ctx, ln_s, ln_b, wq, wk, wv, wo, heads,
        wk_ip=wki, wv_ip=wvi, ip_scale=scale, num_ip_tokens=n_ip,
        eps=1e-5, tile_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                               rtol=2e-4, atol=2e-4)
    ip_ctx = ctx[:, n_ip:]
    dwki = jnp.einsum("bkd,bkc->dc", ip_ctx, dki)
    dwvi = jnp.einsum("bkd,bkc->dc", ip_ctx, dvi)
    np.testing.assert_allclose(np.asarray(dwki), np.asarray(want_dwki),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dwvi), np.asarray(want_dwvi),
                               rtol=2e-4, atol=2e-4)


def test_vjp_routes_bwd_kernel_on_tpu(rng, monkeypatch):
    """_on_tpu patched + interpret kernels: the custom VJP returns kernel dx
    and kernel-derived adapter weight grads matching autodiff."""

    from ap_adapter_tpu.ops import attention as attn_mod

    b, s, c, heads, dc = 1, 64, 128, 4, 48
    n_ip, sk = 8, 8 + 12
    scale = 0.5
    x = _mk(rng, b, s, c)
    ctx = _mk(rng, b, sk, dc)
    ln_s, ln_b = jnp.ones(c), jnp.zeros(c)
    wq, wo = _mk(rng, c, c, scale=c ** -0.5), _mk(rng, c, c, scale=c ** -0.5)
    wk, wv = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    wki, wvi = _mk(rng, dc, c, scale=dc ** -0.5), _mk(rng, dc, c, scale=dc ** -0.5)
    bo = jnp.zeros(c)

    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    orig_fwd = pfc.fused_ln_cross_attention
    orig_bwd = pfc.fused_ln_cross_attention_bwd
    monkeypatch.setattr(pfc, "fused_ln_cross_attention",
                        lambda *a, **k: orig_fwd(*a, **{**k, "tile_q": 32, "interpret": True}))
    monkeypatch.setattr(pfc, "fused_ln_cross_attention_bwd",
                        lambda *a, **k: orig_bwd(*a, **{**k, "tile_q": 32, "interpret": True}))

    def loss(x, wki, wvi):
        return jnp.sum(pfc.fused_ln_cross_attention_vjp(
            x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
            wki, wvi, scale, n_ip, None, 1e-5) ** 2)

    gx, gwki, gwvi = jax.grad(loss, argnums=(0, 1, 2))(x, wki, wvi)
    gx_ref, gwki_ref, gwvi_ref = jax.grad(
        lambda x, wki, wvi: jnp.sum(pfc._xla_reference(
            x, ctx, ln_s, ln_b, wq, wk, wv, wo, bo, heads,
            wki, wvi, scale, n_ip, None, 1e-5) ** 2),
        argnums=(0, 1, 2))(x, wki, wvi)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gwki), np.asarray(gwki_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gwvi), np.asarray(gwvi_ref), rtol=2e-4, atol=2e-4)
