"""Adapter parameter IO tests: site map, flat-dict round trip, masks."""

import pytest
import numpy as np

import jax

from ap_adapter_tpu.configs import UNetConfig
from ap_adapter_tpu.adapter.params import (
    adapter_mask,
    adapter_sites,
    count_adapter_params,
    export_flat_adapter,
    import_flat_adapter,
    init_adapter_from_text_kv,
)
from tests.test_unet import TINY, tiny_unet  # noqa: F401  (fixture reuse)


pytestmark = pytest.mark.quick

def test_adapter_sites_match_reference_layout():
    """The real config must produce exactly the 32 shipped checkpoint sites."""

    cfg = UNetConfig()  # audioldm2-large defaults
    sites = adapter_sites(cfg)
    torch_names = sorted({s[2] for s in sites})
    # 32 attn2 modules total: (3 down blocks x 2 layers + mid + 3 up x 3 layers)
    # x 2 transformer blocks = (6 + 1 + 9) * 2 = 32 — i.e. 64 k/v matrices,
    # matching the 64 files in the reference's copied_cross_attention/.
    assert len(sites) == 32
    assert len(torch_names) == 32
    assert "down_blocks.1.attentions.1.transformer_blocks.0.attn2" in torch_names
    assert "down_blocks.1.attentions.5.transformer_blocks.1.attn2" in torch_names
    assert "mid_block.attentions.1.transformer_blocks.0.attn2" in torch_names
    assert "up_blocks.0.attentions.9.transformer_blocks.1.attn2" in torch_names
    assert "up_blocks.2.attentions.1.transformer_blocks.0.attn2" in torch_names
    assert not any("down_blocks.0" in n for n in torch_names)
    assert not any("up_blocks.3" in n for n in torch_names)


def test_flat_adapter_roundtrip(tiny_unet, rng):  # noqa: F811
    _, params = tiny_unet
    flat = export_flat_adapter(params, TINY)
    assert len(flat) == 20  # 10 sites x {k, v} in the tiny config
    for k, v in flat.items():
        assert k.endswith(".weight") and ".processor.to_" in k
        assert v.ndim == 2

    # modify, import, export again -> identical
    flat2 = {k: v + 1.0 for k, v in flat.items()}
    params2 = import_flat_adapter(params, flat2, TINY)
    flat3 = export_flat_adapter(params2, TINY)
    for k in flat:
        np.testing.assert_allclose(flat3[k], flat[k] + 1.0)

    # non-adapter params untouched
    np.testing.assert_allclose(
        np.asarray(params2["conv_in"]["kernel"]), np.asarray(params["conv_in"]["kernel"])
    )


def test_zero_delta_init(tiny_unet):  # noqa: F811
    _, params = tiny_unet
    params2 = init_adapter_from_text_kv(params, TINY)
    sites = adapter_sites(TINY)
    path = sites[0][0]
    node = params2
    for p in path:
        node = node[p]
    np.testing.assert_allclose(np.asarray(node["to_k_ip"]["kernel"]),
                               np.asarray(node["to_k"]["kernel"]))


def test_adapter_mask_and_count(tiny_unet):  # noqa: F811
    _, params = tiny_unet
    mask = adapter_mask(params)
    n_true = sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(int, mask)))
    assert n_true == 20
    assert count_adapter_params(params) == sum(
        int(np.prod(np.asarray(l).shape))
        for m, l in zip(jax.tree_util.tree_leaves(mask), jax.tree_util.tree_leaves(params))
        if m
    )
