"""T5 encoder (flan-t5-large) in Flax.

TPU-native equivalent of transformers ``T5EncoderModel`` as used at reference
pipeline_audioldm2.py:413-418. Semantics mirror HF T5: RMS layer norm (fp32),
unscaled attention scores, shared relative-position bias held by block 0,
gated-GELU feed-forward for flan checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import T5Config
from ap_adapter_tpu.ops.attention import mask_to_bias


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (scale * x).astype(self.dtype)


def relative_position_bucket(
    relative_position: np.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (HF formula)."""

    num_buckets //= 2
    buckets = (relative_position > 0).astype(np.int64) * num_buckets
    rp = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return buckets + np.where(is_small, rp, large)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        c = self.config
        h, dk = c.num_heads, c.d_kv
        inner = h * dk
        b, n, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, n, h, dk)
        k = k.reshape(b, n, h, dk)
        v = v.reshape(b, n, h, dk)

        if position_bias is None:
            buckets = relative_position_bucket(
                np.arange(n)[None, :] - np.arange(n)[:, None],
                c.relative_attention_num_buckets,
                c.relative_attention_max_distance,
            )
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (c.relative_attention_num_buckets, h),
                jnp.float32,
            )
            position_bias = jnp.transpose(table[jnp.asarray(buckets)], (2, 0, 1))[None]

        # T5 does NOT scale scores by sqrt(d_kv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + position_bias.astype(jnp.float32)
        if mask_bias is not None:
            logits = logits + mask_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=self.dtype, name="o")(out), position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, position_bias):
        c = self.config
        y = RMSNorm(c.layer_norm_eps, dtype=self.dtype, name="attn_norm")(x)
        attn, position_bias = T5Attention(
            c, self.has_relative_bias, dtype=self.dtype, name="attention"
        )(y, mask_bias, position_bias)
        x = x + attn

        y = RMSNorm(c.layer_norm_eps, dtype=self.dtype, name="ff_norm")(x)
        if c.feed_forward_proj == "gated-gelu":
            g = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(y)
            g = nn.gelu(g, approximate=True)  # HF NewGELU (tanh approx)
            lin = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(y)
            y = g * lin
        else:
            y = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype, name="wi")(y)
            y = nn.relu(y)
        y = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype, name="wo")(y)
        return x + y, position_bias


class T5Encoder(nn.Module):
    """input_ids [B, S] (+mask) -> hidden states [B, S, d_model]."""

    config: T5Config = T5Config()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = self.config
        x = nn.Embed(c.vocab_size, c.d_model, dtype=self.dtype, name="shared")(input_ids)
        bias = mask_to_bias(attention_mask, input_ids.shape[1]) if attention_mask is not None else None

        position_bias = None
        for i in range(c.num_layers):
            x, position_bias = T5Block(
                c, has_relative_bias=(i == 0), dtype=self.dtype, name=f"block_{i}"
            )(x, bias, position_bias)
        return RMSNorm(c.layer_norm_eps, dtype=self.dtype, name="final_norm")(x)
