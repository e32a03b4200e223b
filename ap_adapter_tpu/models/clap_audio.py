"""CLAP audio tower (HTSAT Swin transformer) in Flax.

TPU-native equivalent of transformers ``ClapAudioModelWithProjection`` /
``ClapModel.get_audio_features``, needed for the reference's CLAP-similarity
waveform re-ranking (pipeline_audioldm2.py:592-614) and CLAP-based eval.

Pipeline: 4-crop mel "image" reshape (bicubic time-resize with
align_corners=True, reproduced as a precomputed interpolation matrix), Swin
stages with windowed attention + relative position bias + cyclic shifts,
patch merging, and the HTSAT grouped-frequency average-pool head, followed by
the MLP projection and L2 normalization.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import ClapAudioConfig
from ap_adapter_tpu.ops.attention import sdpa


# ---------------------------------------------------------------------------
# bicubic resize matrix (torch F.interpolate(mode="bicubic", align_corners=True))
# ---------------------------------------------------------------------------


def _cubic_kernel(s: np.ndarray, a: float = -0.75) -> np.ndarray:
    s = np.abs(s)
    return np.where(
        s <= 1.0,
        (a + 2) * s ** 3 - (a + 3) * s ** 2 + 1,
        np.where(s < 2.0, a * s ** 3 - 5 * a * s ** 2 + 8 * a * s - 4 * a, 0.0),
    )


@functools.lru_cache(maxsize=16)
def bicubic_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] 1-D cubic-convolution resize, align_corners=True,
    replicate border (matches torch bicubic along one axis)."""

    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = (n_in - 1) / (n_out - 1)
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        x = i * scale
        x0 = int(np.floor(x))
        t = x - x0
        for k, off in enumerate((-1, 0, 1, 2)):
            idx = min(max(x0 + off, 0), n_in - 1)
            w[i, idx] += _cubic_kernel(np.array(t - off))
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# Swin pieces
# ---------------------------------------------------------------------------


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, ws*ws, C]."""

    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nH*nW, ws, ws, C] -> [B, H, W, C]."""

    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=32)
def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


@functools.lru_cache(maxsize=32)
def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """Additive mask [num_windows, ws*ws, ws*ws] for shifted windows (-100)."""

    if shift == 0:
        return None
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, windows: jnp.ndarray, attn_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """windows [NW_total, ws*ws, C]; attn_mask [num_windows, N, N] or None."""

        ws = self.window_size
        n = ws * ws
        h = self.num_heads
        dh = self.dim // h
        bw = windows.shape[0]

        q = nn.Dense(self.dim, dtype=self.dtype, name="query")(windows)
        k = nn.Dense(self.dim, dtype=self.dtype, name="key")(windows)
        v = nn.Dense(self.dim, dtype=self.dtype, name="value")(windows)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            ((2 * ws - 1) * (2 * ws - 1), h),
            jnp.float32,
        )
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(n, n, h)
        bias = jnp.transpose(bias, (2, 0, 1))[None]  # [1, h, n, n]

        if attn_mask is not None:
            nw = attn_mask.shape[0]
            bias = bias + attn_mask[:, None, :, :]  # broadcast over heads
            bias = jnp.tile(bias, (bw // nw, 1, 1, 1))

        out = sdpa(
            q.reshape(bw, n, h, dh),
            k.reshape(bw, n, h, dh),
            v.reshape(bw, n, h, dh),
            mask=bias if attn_mask is not None else jnp.broadcast_to(bias, (bw, h, n, n)),
        )
        out = out.reshape(bw, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="output")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    window_size: int
    shift_size: int
    mlp_ratio: float
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hgt, wid = self.resolution
        ws, shift = self.window_size, self.shift_size
        if min(hgt, wid) <= ws:  # window larger than input: no partition/shift
            ws, shift = min(hgt, wid), 0

        b, n, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layernorm_before")(x)
        y = y.reshape(b, hgt, wid, c)

        pad_b = (ws - hgt % ws) % ws
        pad_r = (ws - wid % ws) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = hgt + pad_b, wid + pad_r

        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))

        windows = window_partition(y, ws)
        mask = shift_attn_mask(hp, wp, ws, shift)
        mask = jnp.asarray(mask) if mask is not None else None
        attn = SwinAttention(c, self.num_heads, ws, dtype=self.dtype, name="attention")(windows, mask)

        y = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :hgt, :wid, :]
        x = shortcut + y.reshape(b, n, c)

        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layernorm_after")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_output")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hgt, wid = self.resolution
        b, n, c = x.shape
        y = x.reshape(b, hgt, wid, c)
        if hgt % 2 or wid % 2:
            y = jnp.pad(y, ((0, 0), (0, hgt % 2), (0, wid % 2), (0, 0)))
        parts = [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2], y[:, 1::2, 1::2]]
        y = jnp.concatenate(parts, axis=-1).reshape(b, -1, 4 * c)
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(y)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(y)


class ClapAudioEncoder(nn.Module):
    """input_features [B, 1, T, F] (log-mel, CLAP extractor layout) -> pooled [B, hidden]."""

    config: ClapAudioConfig = ClapAudioConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        x = input_features.astype(self.dtype)
        b, ch, t, f = x.shape

        # BatchNorm2d over mel bins (eval mode, running stats)
        bn_scale = self.param("bn_scale", nn.initializers.ones, (f,), jnp.float32)
        bn_bias = self.param("bn_bias", nn.initializers.zeros, (f,), jnp.float32)
        bn_mean = self.param("bn_mean", nn.initializers.zeros, (f,), jnp.float32)
        bn_var = self.param("bn_var", nn.initializers.ones, (f,), jnp.float32)
        x = (x - bn_mean[None, None, None, :]) * jax.lax.rsqrt(bn_var + 1e-5)[None, None, None, :]
        x = x * bn_scale[None, None, None, :] + bn_bias[None, None, None, :]

        # reshape_mel2img: bicubic time resize (align_corners=True) + 4-crop stack
        fr = c.freq_ratio
        spec_w = c.spec_size * fr  # target time length
        spec_h = c.spec_size // fr  # target freq bins
        if t != spec_w:
            m = jnp.asarray(bicubic_resize_matrix(t, spec_w))
            x = jnp.einsum("ot,bctf->bcof", m, x)
        if f != spec_h:
            m = jnp.asarray(bicubic_resize_matrix(f, spec_h))
            x = jnp.einsum("of,bctf->bcto", m, x)
        x = x.reshape(b, ch * fr, spec_w // fr, spec_h)
        x = jnp.transpose(x, (0, 1, 3, 2))
        x = x.reshape(b, ch, spec_h * fr, spec_w // fr)  # [B, 1, 256, 256]

        # patch embed (NCHW torch conv -> NHWC here)
        x = jnp.transpose(x, (0, 2, 3, 1))
        pad = ((c.patch_size - c.patch_stride[0]) // 2, (c.patch_size - c.patch_stride[1]) // 2)
        x = nn.Conv(
            c.patch_embeds_hidden_size, (c.patch_size, c.patch_size),
            strides=c.patch_stride, padding=(pad[0], pad[1]),
            dtype=self.dtype, name="patch_proj",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, c.patch_embeds_hidden_size)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="patch_norm")(x)

        res = (gh, gw)
        frames_num = spec_h * fr
        for si, depth in enumerate(c.depths):
            dim = c.patch_embeds_hidden_size * 2 ** si
            for bi in range(depth):
                x = SwinBlock(
                    dim, c.num_heads[si], res, c.window_size,
                    shift_size=0 if bi % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio, eps=c.layer_norm_eps,
                    dtype=self.dtype, name=f"stage_{si}_block_{bi}",
                )(x)
            if si < len(c.depths) - 1:
                x = PatchMerging(dim, res, c.layer_norm_eps, dtype=self.dtype,
                                 name=f"stage_{si}_downsample")(x)
                res = ((res[0] + 1) // 2, (res[1] + 1) // 2)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm")(x)

        # HTSAT head: reshape to [B, C, freq, time], group freq bins, avg pool
        n_ch = x.shape[-1]
        down = 2 ** (len(c.depths) - 1)
        freq_shape = frames_num // down // c.patch_stride[0]
        temp_shape = frames_num // down // c.patch_stride[1]
        y = jnp.transpose(x, (0, 2, 1)).reshape(b, n_ch, freq_shape, temp_shape)
        c_freq_bin = freq_shape // fr
        y = y.reshape(b, n_ch, freq_shape // c_freq_bin, c_freq_bin, temp_shape)
        y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, n_ch, c_freq_bin, -1)
        return jnp.mean(y.reshape(b, n_ch, -1), axis=-1)


class ClapAudioTower(nn.Module):
    """get_audio_features: encoder -> MLP projection -> L2 normalize."""

    config: ClapAudioConfig = ClapAudioConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        pooled = ClapAudioEncoder(c, dtype=self.dtype, name="encoder")(input_features)
        y = nn.Dense(c.projection_dim, dtype=self.dtype, name="projection_1")(pooled)
        y = nn.relu(y)
        y = nn.Dense(c.projection_dim, dtype=self.dtype, name="projection_2")(y)
        norm = jnp.linalg.norm(y.astype(jnp.float32), axis=-1, keepdims=True)
        return (y.astype(jnp.float32) / jnp.maximum(norm, 1e-12)).astype(self.dtype)
