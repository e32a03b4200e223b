"""CLAP text branch: RoBERTa encoder + pooler + MLP projection + L2 norm.

TPU-native equivalent of ``ClapModel.get_text_features`` as used at reference
pipeline_audioldm2.py:404-412 (only the text tower is needed for
conditioning; the audio tower is only used by the optional CLAP re-ranking,
see pipeline/scoring.py). Semantics mirror transformers
``modeling_clap.ClapTextModel`` (post-LN BERT encoder, RoBERTa-style
padding-aware position ids) + ``ClapProjectionLayer`` (linear-relu-linear)
followed by L2 normalization.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ap_adapter_tpu.configs import ClapTextConfig
from ap_adapter_tpu.ops.attention import sdpa, mask_to_bias


def roberta_position_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """Positions count only non-pad tokens, offset by padding_idx; pads stay
    at padding_idx (transformers create_position_ids_from_input_ids)."""

    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


class BertSelfAttention(nn.Module):
    config: ClapTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        c = self.config
        h = c.num_heads
        d = c.hidden_size
        q = nn.Dense(d, dtype=self.dtype, name="query")(x)
        k = nn.Dense(d, dtype=self.dtype, name="key")(x)
        v = nn.Dense(d, dtype=self.dtype, name="value")(x)
        b, n, _ = x.shape
        out = sdpa(
            q.reshape(b, n, h, d // h),
            k.reshape(b, n, h, d // h),
            v.reshape(b, n, h, d // h),
            mask=bias,
        )
        return out.reshape(b, n, d)


class BertLayer(nn.Module):
    config: ClapTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        c = self.config
        attn = BertSelfAttention(c, dtype=self.dtype, name="self")(x, bias)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="attn_norm")(x + attn)

        y = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(y)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="out_norm")(x + y)


class ClapTextEncoder(nn.Module):
    """input_ids [B, S] (+mask) -> L2-normalized text features [B, projection_dim]."""

    config: ClapTextConfig = ClapTextConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.config
        if attention_mask is None:
            attention_mask = (input_ids != c.pad_token_id).astype(jnp.int32)

        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = roberta_position_ids(input_ids, c.pad_token_id)
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="position_embeddings"
        )(pos_ids)
        tok_type = nn.Embed(
            c.type_vocab_size, c.hidden_size, dtype=self.dtype, name="token_type_embeddings"
        )(jnp.zeros_like(input_ids))
        x = word + tok_type + pos
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="embeddings_norm")(x)

        bias = mask_to_bias(attention_mask, input_ids.shape[1])
        for i in range(c.num_layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, bias)

        pooled = nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)

        y = nn.Dense(c.projection_dim, dtype=self.dtype, name="projection_1")(pooled)
        y = nn.relu(y)
        y = nn.Dense(c.projection_dim, dtype=self.dtype, name="projection_2")(y)
        norm = jnp.linalg.norm(y.astype(jnp.float32), axis=-1, keepdims=True)
        return (y.astype(jnp.float32) / jnp.maximum(norm, 1e-12)).astype(self.dtype)
