"""Fused GroupNorm kernel vs flax nn.GroupNorm (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from ap_adapter_tpu.ops import pallas_groupnorm as pg


@pytest.mark.parametrize("shape,groups", [
    ((2, 100, 64), 8),    # non-8-aligned N (padding path)
    ((1, 64, 256), 32),
    ((3, 16, 32), 4),
])
@pytest.mark.parametrize("act", [False, True])
def test_fused_group_norm_matches_flax(rng, shape, groups, act):
    b, n, c = shape
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    want = gn.apply({"params": {"scale": gamma, "bias": beta}}, x[:, :, None, :])[:, :, 0, :]
    if act:
        want = nn.silu(want)

    got = pg.fused_group_norm(x, gamma, beta, groups, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_group_norm_silu_grads(rng):
    """Custom-VJP wrapper grads match differentiating flax GroupNorm."""

    b, n, c, groups = 1, 24, 16, 4
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    orig = pg.fused_group_norm
    pg.fused_group_norm = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        g1 = jax.grad(lambda x: jnp.sum(pg.group_norm_silu(x, gamma, beta, groups, 1e-5, True) ** 2))(x)
    finally:
        pg.fused_group_norm = orig
    g2 = jax.grad(lambda x: jnp.sum(pg._xla_reference(x, gamma, beta, groups, 1e-5, True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_resnet_use_pallas_gn_routing(rng, monkeypatch):
    """UNetConfig.use_pallas_groupnorm routes ResnetBlock2D's GN+SiLU pairs
    to the fused kernel with an identical param tree and matching outputs
    (interpret mode on CPU)."""

    import jax
    import jax.numpy as jnp

    import ap_adapter_tpu.models.unet_blocks as ub
    import ap_adapter_tpu.ops.pallas_groupnorm as pg

    monkeypatch.setattr(ub, "_on_tpu", lambda: True)
    orig = pg.fused_group_norm
    monkeypatch.setattr(pg, "fused_group_norm",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    x = jnp.asarray(rng.standard_normal((2, 8, 4, 32)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    block_off = ub.ResnetBlock2D(32, groups=4, use_pallas_gn=False)
    block_on = ub.ResnetBlock2D(32, groups=4, use_pallas_gn=True)
    params = block_off.init(jax.random.PRNGKey(0), x, temb)["params"]
    # same param tree: the kernel path must consume the converted checkpoint
    p2 = block_on.init(jax.random.PRNGKey(0), x, temb)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)

    import numpy as np
    y_off = block_off.apply({"params": params}, x, temb)
    y_on = block_on.apply({"params": params}, x, temb)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=2e-5, atol=2e-5)


def test_tiled_two_phase_matches_reference(rng):
    """Big-slab route (two-phase tiled stats) == XLA GN reference."""

    import jax.numpy as jnp

    import ap_adapter_tpu.ops.pallas_groupnorm as pg

    b, n, c, groups = 2, 1100, 256, 32  # > _WHOLE_SLAB_BYTES at 16 B/elem? no
    # force the tiled route regardless of slab size
    orig_budget, orig_tile = pg._WHOLE_SLAB_BYTES, pg._GN_TILE
    pg._WHOLE_SLAB_BYTES, pg._GN_TILE = 1, 256
    try:
        x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
        gamma = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
        for act in (False, True):
            want = np.asarray(pg._xla_reference(x, gamma, beta, groups, 1e-5, act))
            got = np.asarray(pg.fused_group_norm(
                x, gamma, beta, groups, eps=1e-5, act=act, interpret=True))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    finally:
        pg._WHOLE_SLAB_BYTES, pg._GN_TILE = orig_budget, orig_tile
