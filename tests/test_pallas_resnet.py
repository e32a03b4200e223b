"""Fused ResnetBlock2D kernel (GN+SiLU+conv3x3+temb+GN+SiLU+conv3x3+shortcut
in one Pallas kernel) vs the XLA reference math (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ap_adapter_tpu.ops import pallas_resnet as prn


def _mk(rng, *shape, scale=1.0):
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32))


def _args(rng, b, h, w, c_in, c_out, groups, with_temb=True, with_sc=None):
    if with_sc is None:
        with_sc = c_in != c_out
    x = _mk(rng, b, h, w, c_in)
    temb = _mk(rng, b, c_out) if with_temb else None
    gn1_s, gn1_b = _mk(rng, c_in), _mk(rng, c_in, scale=0.1)
    w1 = _mk(rng, 3, 3, c_in, c_out, scale=(9 * c_in) ** -0.5)
    b1 = _mk(rng, c_out, scale=0.1)
    gn2_s, gn2_b = _mk(rng, c_out), _mk(rng, c_out, scale=0.1)
    w2 = _mk(rng, 3, 3, c_out, c_out, scale=(9 * c_out) ** -0.5)
    b2 = _mk(rng, c_out, scale=0.1)
    wsc = _mk(rng, 1, 1, c_in, c_out, scale=c_in ** -0.5) if with_sc else None
    bsc = _mk(rng, c_out, scale=0.1) if with_sc else None
    return (x, temb, gn1_s, gn1_b, w1, b1, gn2_s, gn2_b, w2, b2, wsc, bsc)


@pytest.mark.parametrize("b,h,w,c_in,c_out,groups", [
    (2, 10, 8, 128, 128, 32),    # same-channel (identity shortcut)
    (1, 9, 4, 256, 128, 32),     # channel change (1x1 conv shortcut), odd H
    (1, 6, 2, 128, 256, 32),     # upsampling-style channel growth, tiny W
])
def test_fused_resnet_matches_reference(rng, b, h, w, c_in, c_out, groups):
    args = _args(rng, b, h, w, c_in, c_out, groups)
    want = np.asarray(prn._xla_reference(*args, groups, 1e-5))
    got = np.asarray(prn.fused_resnet_block(
        *args[:10], sc_w=args[10], sc_b=args[11], groups=groups, eps=1e-5,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_resnet_no_temb(rng):
    """VAE-style resnet without a time embedding."""

    args = _args(rng, 1, 8, 4, 128, 128, 32, with_temb=False)
    want = np.asarray(prn._xla_reference(*args, 32, 1e-5))
    got = np.asarray(prn.fused_resnet_block(
        *args[:10], sc_w=args[10], sc_b=args[11], groups=32, eps=1e-5,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_resnet_vjp_grads(rng):
    """custom-VJP backward (XLA reference autodiff) matches direct autodiff
    through the reference — dx and a trainable-weight grad."""

    args = _args(rng, 1, 6, 4, 128, 128, 16)
    x = args[0]

    def loss_fused(x):
        return jnp.sum(prn.fused_resnet_block_vjp(
            x, *args[1:], 16, 1e-5) ** 2)

    def loss_ref(x):
        return jnp.sum(prn._xla_reference(*(x,) + args[1:], 16, 1e-5) ** 2)

    # interpret-mode forward for CPU
    orig = prn.fused_resnet_block
    prn.fused_resnet_block = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        g1 = jax.grad(loss_fused)(x)
    finally:
        prn.fused_resnet_block = orig
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_resnet_module_route_matches_and_same_param_tree(rng, monkeypatch):
    """ResnetBlock2D(use_pallas_resnet=True) creates the SAME param tree as
    the XLA path (checkpoints are route-independent) and computes the same
    output from identical params."""

    from ap_adapter_tpu.models import unet_blocks as ub

    monkeypatch.setattr(ub, "_on_tpu", lambda: True)
    orig = prn.fused_resnet_block
    monkeypatch.setattr(prn, "fused_resnet_block",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    x = jnp.asarray(rng.standard_normal((1, 8, 4, 128)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((1, 96)).astype(np.float32))
    m_fused = ub.ResnetBlock2D(256, groups=32, use_pallas_resnet=True)
    m_xla = ub.ResnetBlock2D(256, groups=32)
    p_fused = m_fused.init(jax.random.PRNGKey(0), x, temb)["params"]
    p_xla = m_xla.init(jax.random.PRNGKey(0), x, temb)["params"]
    assert jax.tree.map(jnp.shape, p_fused) == jax.tree.map(jnp.shape, p_xla)

    y_fused = m_fused.apply({"params": p_xla}, x, temb)
    y_xla = m_xla.apply({"params": p_xla}, x, temb)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                               rtol=2e-4, atol=2e-4)


def test_fused_resnet_fits():
    # L0 down + L1/L2 resnets fit (incl. their concat-skip up-resnets); the
    # L0 up-resnets' [4000, 256/384] input slabs exceed the live-peak budget
    # (double-buffered x dominates), and the L3/mid 640-channel blocks are
    # excluded — their 3x3 conv WEIGHTS alone are 13-24 MB, beyond VMEM
    # (their 64-row slabs are cheap in XLA anyway)
    assert prn.fused_resnet_fits(250, 16, 128, 128)
    assert not prn.fused_resnet_fits(250, 16, 384, 128)
    assert prn.fused_resnet_fits(125, 8, 640, 256)
    assert prn.fused_resnet_fits(63, 4, 768, 384)
    assert not prn.fused_resnet_fits(32, 2, 640, 640)
    assert not prn.fused_resnet_fits(32, 2, 1280, 640)
