"""Adapter (decoupled audio-KV) parameter handling.

The trainable surface of the whole framework is the 32 pairs of
``to_k_ip``/``to_v_ip`` matrices living inside the UNet param tree. This
module provides:

  * the site map between our nested Flax paths and the reference's flat
    torch checkpoint keys (``<site>.processor.to_{k,v}_ip.weight`` —
    inference.py:51-57, train_apadapter_v2.py:649-663),
  * flat-dict import/export for checkpoint interop,
  * zero-delta initialization from the frozen text K/V (copy_weight.py),
  * the trainability mask for optax.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np

from ap_adapter_tpu.configs import UNetConfig


def adapter_sites(config: UNetConfig) -> List[Tuple[Tuple[str, ...], int, str]]:
    """[(flax_group_path, block_index, torch_site_prefix)] per adapted attn2.

    flax_group_path addresses the CrossAttention module (".../attn2") whose
    parameters are STACKED [L, ...] along the nn.scan axis; ``block_index``
    selects the transformer block within the stack. torch_site_prefix is e.g.
    ``down_blocks.1.attentions.1.transformer_blocks.0.attn2``.
    """

    n_dims = len(config.cross_attention_dims)
    adapter_idxs = [
        i for i, d in enumerate(config.cross_attention_dims)
        if d is not None and d == config.adapter_cross_attention_dim
    ]
    sites = []

    def add(flax_block: str, torch_block: str, layer: int):
        for g in adapter_idxs:
            flat = layer * n_dims + g
            for t in range(config.transformer_layers_per_block):
                sites.append((
                    (flax_block, f"attentions_{g}", "transformer_blocks", "attn2"),
                    t,
                    f"{torch_block}.attentions.{flat}.transformer_blocks.{t}.attn2",
                ))

    num_blocks = len(config.block_out_channels)
    for b in range(num_blocks):
        if config.down_block_has_attn[b]:
            for l in range(config.layers_per_block):
                add(f"down_{b}_attn_{l}", f"down_blocks.{b}", l)
    add("mid_attn_0", "mid_block", 0)
    for b in range(num_blocks):
        if config.up_block_has_attn[b]:
            for l in range(config.layers_per_block + 1):
                add(f"up_{b}_attn_{l}", f"up_blocks.{b}", l)
    return sites


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def export_flat_adapter(unet_params, config: UNetConfig) -> Dict[str, np.ndarray]:
    """Flax UNet params -> reference-format flat dict (torch [out,in] layout).

    Keys: ``<site>.processor.to_{k,v}_ip.weight`` (matching inference.py:54-55
    with name = "<site>.processor").
    """

    flat = {}
    for flax_path, t, torch_prefix in adapter_sites(config):
        attn = _get(unet_params, flax_path)
        for nm in ("to_k_ip", "to_v_ip"):
            kernel = np.asarray(attn[nm]["kernel"])[t]  # stacked [L, in, out]
            flat[f"{torch_prefix}.processor.{nm}.weight"] = np.ascontiguousarray(kernel.T)
    return flat


def import_flat_adapter(unet_params, flat: Dict[str, np.ndarray], config: UNetConfig):
    """Load a reference-format flat adapter dict into the Flax UNet params."""

    params = jax.tree_util.tree_map(lambda x: x, unet_params)  # shallow copy tree

    for flax_path, t, torch_prefix in adapter_sites(config):
        attn = _get(params, flax_path)
        for nm in ("to_k_ip", "to_v_ip"):
            key = f"{torch_prefix}.processor.{nm}.weight"
            if key not in flat:
                # reference also writes keys without ".processor"
                key = f"{torch_prefix}.{nm}.weight"
            stacked = np.array(np.asarray(attn[nm]["kernel"]), copy=True)
            stacked[t] = np.asarray(flat[key]).T
            attn[nm] = {"kernel": stacked}
    return params


def init_adapter_from_text_kv(unet_params, config: UNetConfig):
    """Zero-delta init: copy each site's frozen to_k/to_v into to_k_ip/to_v_ip
    (the reference ships these copies in copied_cross_attention/ —
    copy_weight.py:44-62)."""

    params = jax.tree_util.tree_map(lambda x: x, unet_params)
    seen = set()
    for flax_path, _, _ in adapter_sites(config):
        if flax_path in seen:
            continue  # stacked params cover every block index at once
        seen.add(flax_path)
        attn = _get(params, flax_path)
        attn["to_k_ip"] = {"kernel": np.array(attn["to_k"]["kernel"], copy=True)}
        attn["to_v_ip"] = {"kernel": np.array(attn["to_v"]["kernel"], copy=True)}
    return params


def adapter_mask(params_tree):
    """Pytree of bools: True only on to_k_ip/to_v_ip leaves (optax mask)."""

    def mask_fn(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        return any(k in ("to_k_ip", "to_v_ip") for k in keys)

    return jax.tree_util.tree_map_with_path(mask_fn, params_tree)


def count_adapter_params(params_tree) -> int:
    mask = adapter_mask(params_tree)
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda m, p: int(np.prod(p.shape)) if m else 0, mask, params_tree)
    )
    return int(sum(leaves))
