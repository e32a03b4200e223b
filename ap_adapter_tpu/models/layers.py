"""Shared model building blocks: positional embeddings, timestep embeddings.

Numerics mirror the reference implementations cited per-function; tables are
computed host-side in numpy and baked into the graph as constants.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """1-D sin-cos embedding (reference models_mae.py:104-126)."""

    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


@functools.lru_cache(maxsize=8)
def audiomae_pos_embed(embed_dim: int, grid_hw: tuple[int, int], cls_token: bool = True) -> np.ndarray:
    """Fixed 2-D sin-cos positional embedding for AudioMAE.

    Reproduces ``get_2d_sincos_pos_embed_flexible(embed_dim, patch_hw, cls)``
    (reference models_mae.py:136-151) including its meshgrid quirk: the grid is
    built with ``np.meshgrid(grid_w, grid_h)`` ('xy' indexing) and the first
    half of the channel dim encodes grid[0] (the *w* values). ``grid_hw`` here
    is the reference's ``patch_embed.patch_hw`` == (W/16, H/16) == (8, 64) for
    (1024, 128) inputs. The pretrained checkpoint was trained with exactly this
    table, so it is replicated bit-for-bit rather than "fixed".
    """

    gh, gw = grid_hw
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # 'xy': shapes (gh, gw)
    grid = np.stack(grid, axis=0).reshape([2, 1, gh, gw])
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb.astype(np.float32)


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding matching diffusers ``Timesteps``
    (used by the UNet at reference modeling_audioldm2.py:324-339).

    timesteps: [B] -> [B, embedding_dim], computed in fp32.
    """

    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        out = jnp.concatenate([cos, sin], axis=-1)
    else:
        out = jnp.concatenate([sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        out = jnp.pad(out, [(0, 0), (0, 1)])
    return out
