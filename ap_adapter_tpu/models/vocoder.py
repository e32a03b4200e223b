"""HiFi-GAN vocoder (transformers SpeechT5HifiGan semantics) in Flax.

Turns VAE-decoded mel spectrograms into 16 kHz waveforms on-device
(reference pipeline_audioldm2.py:583-590). Layout: [B, T, C] sequences;
transposed convolutions are implemented via input-dilated regular
convolutions so everything stays on the conv/MXU path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import VocoderConfig


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


class ConvTranspose1d(nn.Module):
    """torch ConvTranspose1d(stride, padding=(k-stride)//2) equivalent.

    Kernel param layout is [W, in, out] (matching convert.t_conv_transpose1d);
    computed as an input-dilated correlation with the flipped kernel.
    """

    out_channels: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s = self.kernel_size, self.stride
        pad = (k - s) // 2
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, in_ch, self.out_channels), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        # conv_transpose(x, w) == conv(dilate(x, s), flip(w)) with pad k-1-p
        w = jnp.flip(kernel, axis=0).astype(self.dtype)  # [W, in, out]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w,
            window_strides=(1,),
            padding=[(k - 1 - pad, k - 1 - pad)],
            lhs_dilation=(s,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias.astype(self.dtype)


class ResBlock(nn.Module):
    kernel_size: int
    dilations: tuple
    slope: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            y = _leaky(x, self.slope)
            y = nn.Conv(ch, (k,), kernel_dilation=(d,), padding=((k - 1) // 2 * d,),
                        dtype=self.dtype, name=f"convs1_{i}")(y)
            y = _leaky(y, self.slope)
            y = nn.Conv(ch, (k,), padding=((k - 1) // 2,), dtype=self.dtype, name=f"convs2_{i}")(y)
            x = x + y
        return x


class HiFiGAN(nn.Module):
    config: VocoderConfig = VocoderConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spectrogram: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, model_in_dim] -> waveform [B, T * upsample_factor]."""

        c = self.config
        x = spectrogram.astype(self.dtype)
        if c.normalize_before:
            mean = self.param("mean", nn.initializers.zeros, (c.model_in_dim,), jnp.float32)
            scale = self.param("scale", nn.initializers.ones, (c.model_in_dim,), jnp.float32)
            x = (x - mean.astype(self.dtype)) / scale.astype(self.dtype)

        x = nn.Conv(c.upsample_initial_channel, (7,), padding=(3,), dtype=self.dtype, name="conv_pre")(x)
        num_kernels = len(c.resblock_kernel_sizes)
        for i, (rate, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            x = _leaky(x, c.leaky_relu_slope)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(ch, k, rate, dtype=self.dtype, name=f"upsampler_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                y = ResBlock(rk, tuple(rd), c.leaky_relu_slope, dtype=self.dtype,
                             name=f"resblock_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels

        x = _leaky(x, c.leaky_relu_slope)
        x = nn.Conv(1, (7,), padding=(3,), dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
