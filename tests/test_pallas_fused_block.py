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
    ((2, 60, 384), 8),    # d=48 -> padded to 64 via the weight reshape
    ((1, 64, 640), 8),    # d=80 -> padded to 128 (g=1, 8 lane groups)
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


@pytest.mark.parametrize("shape,heads", [
    ((1, 300, 256), 8),   # hot-site layout, padded 300 -> 512 (mask on)
    ((1, 256, 256), 8),   # lane-exact single tile (mask statically skipped)
    ((2, 300, 384), 8),   # d=48 -> padded 64, g=2
    ((1, 260, 128), 2),   # d=64, g=2, single lane group
])
def test_kt_kernel_matches_unfused(rng, shape, heads):
    """v2 transposed-PV kernel (_kernel_kt) parity. bf16-free (fp32 inputs,
    interpret mode): tolerances cover only the denominator-from-rounded-e
    reassociation."""

    b, s, c = shape
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ws = [jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
          for _ in range(4)]
    bo = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    want = np.asarray(_unfused(x, ln_s, ln_b, *ws, bo, heads, 1e-5))
    got = np.asarray(pfb.fused_ln_self_attention(
        x, ln_s, ln_b, *ws, bo, heads, eps=1e-5, interpret=True, kt=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape,heads", [
    ((2, 100, 256), 8),   # hot-site layout (2 lane groups x 4 packed heads)
    ((1, 40, 128), 2),    # d=64, g=2, single lane group
])
def test_pipe_kernel_matches_unfused(rng, shape, heads):
    """Software-pipelined variant (_kernel_pipe, AP_ATTN_PIPE) parity.
    Measured slower than the baseline ordering on v5e (docs/PERF.md r4),
    kept opt-in; parity must hold regardless."""

    b, s, c = shape
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ws = [jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
          for _ in range(4)]
    bo = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    want = np.asarray(_unfused(x, ln_s, ln_b, *ws, bo, heads, 1e-5))
    got = np.asarray(pfb.fused_ln_self_attention(
        x, ln_s, ln_b, *ws, bo, heads, eps=1e-5, tile_q=64, interpret=True,
        pipe=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_maxsub_legacy_path_matches(rng, monkeypatch):
    """AP_ATTN_MAXSUB=1 (classic rowwise-max softmax) must keep matching the
    default clamped max-free form — both are plain softmax up to rounding."""

    b, s, c, heads = 2, 100, 256, 8
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.ones(c)
    ln_b = jnp.zeros(c)
    ws = [jnp.asarray((rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
          for _ in range(4)]
    bo = jnp.zeros(c)

    got = np.asarray(pfb.fused_ln_self_attention(
        x, ln_s, ln_b, *ws, bo, heads, eps=1e-5, tile_q=64, interpret=True))
    monkeypatch.setattr(pfb, "_MAXSUB", True)
    want = np.asarray(pfb.fused_ln_self_attention(
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


def test_bwd_dx_kernel_matches_autodiff(rng):
    """Pallas backward dx kernel (reverse staircase, accumulated dk/dv,
    LN-backward epilogue) vs jax.grad through the unfused reference."""

    import jax

    b, s, c, heads = 2, 100, 256, 8
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    mk = lambda: jnp.asarray(
        (rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
    wq, wk, wv, wo = mk(), mk(), mk(), mk()
    bo = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))

    want = jax.grad(lambda x: jnp.sum(
        pfb._xla_reference(x, ln_s, ln_b, wq, wk, wv, wo, bo, 8, 1e-5) * ct))(x)
    got = pfb.fused_ln_self_attention_bwd_dx(
        x, ct, ln_s, ln_b, wq, wk, wv, wo, heads, eps=1e-5, tile_q=64,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape,heads", [
    ((2, 60, 384), 8),    # d=48 (padded-head staircase)
    ((1, 64, 640), 8),    # d=80
])
def test_bwd_dx_kernel_padded_heads(rng, shape, heads):
    """Pallas backward dx kernel at the 48/80-dim head widths (weight-folded
    head padding) vs jax.grad through the unfused reference."""

    b, s, c = shape
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    mk = lambda: jnp.asarray(
        (rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
    wq, wk, wv, wo = mk(), mk(), mk(), mk()
    bo = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))

    want = jax.grad(lambda x: jnp.sum(
        pfb._xla_reference(x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, 1e-5) * ct))(x)
    got = pfb.fused_ln_self_attention_bwd_dx(
        x, ct, ln_s, ln_b, wq, wk, wv, wo, heads, eps=1e-5, tile_q=64,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_vjp_routes_bwd_kernel_on_tpu(rng, monkeypatch):
    """With _on_tpu patched + interpret kernels, the custom VJP's dx comes
    from the Pallas bwd kernel and weight grads stay correct."""

    import jax

    from ap_adapter_tpu.ops import attention as attn_mod

    b, s, c, heads = 1, 64, 128, 4  # d=32, g=4, one lane group
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s, ln_b = jnp.ones(c), jnp.zeros(c)
    mk = lambda: jnp.asarray(
        (rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
    wq, wk, wv, wo = mk(), mk(), mk(), mk()
    bo = jnp.zeros(c)

    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    orig_fwd = pfb.fused_ln_self_attention
    orig_bwd = pfb.fused_ln_self_attention_bwd_dx
    monkeypatch.setattr(pfb, "fused_ln_self_attention",
                        lambda *a, **k: orig_fwd(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(pfb, "fused_ln_self_attention_bwd_dx",
                        lambda *a, **k: orig_bwd(*a, **{**k, "interpret": True}))

    def loss(x, wq):
        return jnp.sum(pfb.fused_ln_self_attention_vjp(
            x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, 1e-5, 64) ** 2)

    gx, gwq = jax.grad(loss, argnums=(0, 1))(x, wq)
    gx_ref, gwq_ref = jax.grad(
        lambda x, wq: jnp.sum(pfb._xla_reference(
            x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, 1e-5) ** 2),
        argnums=(0, 1))(x, wq)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gwq), np.asarray(gwq_ref), rtol=2e-4, atol=2e-4)


def test_transposed_kernel_matches_straight(rng):
    """_kernel_t (transposed-logits, waste-free PV) == _kernel == unfused."""

    b, s, c, heads = 2, 100, 256, 8
    x = jnp.asarray(rng.standard_normal((b, s, c)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ln_b = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    mk = lambda: jnp.asarray(
        (rng.standard_normal((c, c)) / np.sqrt(c)).astype(np.float32))
    wq, wk, wv, wo = mk(), mk(), mk(), mk()
    bo = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)

    want = np.asarray(pfb._xla_reference(x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, 1e-5))
    got = np.asarray(pfb.fused_ln_self_attention(
        x, ln_s, ln_b, wq, wk, wv, wo, bo, heads, tile_q=64,
        interpret=True, transposed=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
