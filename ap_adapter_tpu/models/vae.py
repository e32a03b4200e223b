"""KL autoencoder over mel spectrograms (diffusers AutoencoderKL semantics).

Used by the pipeline to decode latents (reference pipeline_audioldm2.py:
1036-1038) and by the trainer to encode mels (train_apadapter_v2.py:895-897).
NHWC layout: mels are [B, T, F, 1], latents [B, T/4, F/4, latent_channels].
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import VAEConfig
from ap_adapter_tpu.models.unet_blocks import ResnetBlock2D, Upsample2D
from ap_adapter_tpu.ops.attention import self_attention


class VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block (diffusers
    ``Attention`` with residual_connection=True and biased projections)."""

    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        out = self_attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        out = out.reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + x


class DownsampleVAE(nn.Module):
    """Stride-2 conv with diffusers' asymmetric (0,1) input padding."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        ch = c.block_out_channels
        g = c.norm_num_groups
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for bi, out_ch in enumerate(ch):
            for li in range(c.layers_per_block):
                x = ResnetBlock2D(out_ch, g, 1e-6, use_temb=False, dtype=self.dtype,
                                  name=f"down_{bi}_resnet_{li}")(x)
            if bi < len(ch) - 1:
                x = DownsampleVAE(out_ch, dtype=self.dtype, name=f"down_{bi}_downsample")(x)
        x = ResnetBlock2D(ch[-1], g, 1e-6, use_temb=False, dtype=self.dtype, name="mid_resnet_0")(x)
        if c.mid_block_attention:
            x = VAEAttention(g, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(ch[-1], g, 1e-6, use_temb=False, dtype=self.dtype, name="mid_resnet_1")(x)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        ch = list(reversed(c.block_out_channels))
        g = c.norm_num_groups
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock2D(ch[0], g, 1e-6, use_temb=False, dtype=self.dtype, name="mid_resnet_0")(x)
        if c.mid_block_attention:
            x = VAEAttention(g, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(ch[0], g, 1e-6, use_temb=False, dtype=self.dtype, name="mid_resnet_1")(x)
        for bi, out_ch in enumerate(ch):
            for li in range(c.layers_per_block + 1):
                x = ResnetBlock2D(out_ch, g, 1e-6, use_temb=False, dtype=self.dtype,
                                  name=f"up_{bi}_resnet_{li}")(x)
            if bi < len(ch) - 1:
                x = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{bi}_upsample")(x)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Dense(2 * self.config.latent_channels, name="quant_conv", dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.config.latent_channels, name="post_quant_conv", dtype=self.dtype)

    def moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """mel [B, T, F, 1] -> (mean, logvar) of the latent distribution."""

        h = self.encoder(x)
        h = self.quant_conv(h)  # 1x1 conv == dense
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Sample z ~ N(mean, std) and scale (reference train:895-897)."""

        mean, logvar = self.moments(x)
        std = jnp.exp(0.5 * logvar)
        noise = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return (mean + std * noise) * self.config.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Latents (already divided by scaling_factor) -> mel [B, T, F, 1]."""

        z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        z = self.encode(x, rng)
        return self.decode(z / self.config.scaling_factor)
