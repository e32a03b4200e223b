"""AudioMAE: ViT-B/16 masked-autoencoder audio encoder (inference paths only).

TPU-native re-design of the reference encoder stack
(audio_encoder/models_mae.py + audio_encoder/AudioMAE.py): Flax modules,
NHWC patchify conv, bf16-friendly compute with fp32 params, and reshape-based
fused avg+max pooling (ops/pooling.py). The MAE pretraining side (random
masking, decoder, reconstruction loss) lives in models/mae_pretrain.py.

Weight layout mirrors timm ViT naming (qkv fused linear, proj, fc1/fc2) so
PyTorch checkpoints convert 1:1 (convert/torch_import.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ap_adapter_tpu.configs import AudioMAEConfig
from ap_adapter_tpu.models.layers import audiomae_pos_embed
from ap_adapter_tpu.ops.attention import sdpa
from ap_adapter_tpu.ops.pooling import avg_max_pool_tokens


class ViTSelfAttention(nn.Module):
    """timm-style MHA with a fused qkv projection (models_mae.py Block)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, d = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * d, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = sdpa(q, k, v)
        out = out.reshape(b, n, d)
        return nn.Dense(d, use_bias=True, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-LN transformer block: x + attn(ln(x)); x + mlp(ln(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        x = x + ViTSelfAttention(self.num_heads, dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="fc2")(y)
        return x + y


class AudioMAEEncoder(nn.Module):
    """MAE ViT encoder over [B, T, F] log-mel fbanks.

    ``__call__`` implements the reference's
    ``forward_encoder_no_random_mask_no_average`` (models_mae.py:548-570):
    patchify, +pos embed, prepend CLS, all blocks, final LayerNorm.
    ``contextual`` implements ``forward_encoder_no_mask`` (models_mae.py:
    572-595): mean of ``norm(x)`` over blocks with index > contextual_depth.
    """

    config: AudioMAEConfig = AudioMAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.patch_proj = nn.Conv(
            c.embed_dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.embed_dim), jnp.float32
        )
        # fixed (non-trainable) sin-cos table; patch_hw == (F/16, T/16) to
        # match the reference quirk (see layers.audiomae_pos_embed).
        t, f = c.grid_size
        self.pos_embed = jnp.asarray(audiomae_pos_embed(c.embed_dim, (f, t), cls_token=True))
        self.blocks = [
            ViTBlock(c.num_heads, c.mlp_ratio, c.layer_norm_eps, dtype=self.dtype, name=f"block_{i}")
            for i in range(c.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm")

    def _embed(self, fbank: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        x = fbank[..., None].astype(self.dtype)  # [B, T, F, 1] NHWC
        x = self.patch_proj(x)  # [B, T/16, F/16, D]
        b = x.shape[0]
        x = x.reshape(b, -1, c.embed_dim)  # row-major (time, freq) tokens
        x = x + self.pos_embed[None, 1:, :].astype(self.dtype)
        cls = (self.cls_token + self.pos_embed[None, :1, :]).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (b, 1, c.embed_dim))
        return jnp.concatenate([cls, x], axis=1)

    def __call__(self, fbank: jnp.ndarray) -> jnp.ndarray:
        """fbank [B, T, F] -> tokens [B, 1 + T/16*F/16, D] (final-norm path)."""

        x = self._embed(fbank)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)

    def masked(self, fbank: jnp.ndarray, ids_keep: jnp.ndarray) -> jnp.ndarray:
        """Masked-pretraining encode (reference forward_encoder,
        models_mae.py:522-546): patchify, +pos embed, keep only the
        ``ids_keep`` token subset, prepend CLS, all blocks, final norm.

        ``ids_keep`` [B, len_keep] comes from mae_pretrain.random_masking /
        random_masking_2d; static len_keep keeps the whole step jittable.
        Returns [B, 1 + len_keep, D].
        """

        c = self.config
        x = fbank[..., None].astype(self.dtype)
        x = self.patch_proj(x)
        b = x.shape[0]
        x = x.reshape(b, -1, c.embed_dim)
        x = x + self.pos_embed[None, 1:, :].astype(self.dtype)
        x = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
        cls = (self.cls_token + self.pos_embed[None, :1, :]).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (b, 1, c.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)

    def contextual(self, fbank: jnp.ndarray) -> jnp.ndarray:
        """Contextual-average path (mean of normed activations past depth 8)."""

        x = self._embed(fbank)
        acc = jnp.zeros_like(x)
        count = 0
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i > self.config.contextual_depth:
                acc = acc + self.norm(x)
                count += 1
        return acc / max(count, 1)


class AudioMAECondition(nn.Module):
    """AudioMAE conditioner with fused avg+max time/freq pooling.

    Mirrors ``AudioMAEConditionCTPoolRand`` (AudioMAE.py:94-212): encode the
    fbank, drop CLS, pool the (T/16, F/16) token grid with kernel == stride ==
    (time_pool, freq_pool), return pooled tokens. The all-ones mask the
    reference also returns is implicit (no padding is ever produced).
    """

    config: AudioMAEConfig = AudioMAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = AudioMAEEncoder(self.config, dtype=self.dtype, name="audiomae")

    def __call__(self, fbank: jnp.ndarray, time_pool: int, freq_pool: int) -> jnp.ndarray:
        tokens = self.encoder(fbank)  # [B, 1+N, D]
        tokens = tokens[:, 1:, :]
        return avg_max_pool_tokens(tokens, self.config.grid_size, time_pool, freq_pool)

    def unconditional(self, batch: int, time_pool: int, freq_pool: int) -> jnp.ndarray:
        """Zero embedding used for CFG (reference AudioMAE.py:132-146).

        Note: the inference pipeline computes the uncond branch by encoding a
        zeros fbank (pipeline_audioldm2.py:929), NOT by returning zeros; use
        ``__call__(jnp.zeros(...))`` for that path. This helper mirrors
        ``get_unconditional_condition`` for training-time dropout.
        """

        t, f = self.config.grid_size
        n = (t // time_pool) * (f // freq_pool)
        return jnp.zeros((batch, n, self.config.embed_dim), dtype=self.dtype)
