"""GPT-2 "language of audio" model with fixed-length scan generation.

The reference drives ``transformers.GPT2Model`` through a Python AR loop that
feeds back the *last hidden state* (not sampled tokens) and keeps the last 8
hidden states (pipeline_audioldm2.py:231-270). Here that loop is a
``lax.scan`` over a static number of steps with a preallocated KV cache, so
the whole generation compiles into the single jitted conditioning graph.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import GPT2Config


def _gelu_new(x):
    return nn.gelu(x, approximate=True)


class GPT2Attention(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 cache_index: Optional[jnp.ndarray] = None):
        """x [B, S, D]. With ``cache`` (k, v of shape [B, L, H, dk]) the new
        keys/values are written at ``cache_index`` and attention runs over the
        whole cache; otherwise causal attention over the sequence."""

        c = self.config
        h = c.n_head
        d = c.n_embd
        dk = d // h
        b, s, _ = x.shape

        qkv = nn.Dense(3 * d, dtype=self.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, h, dk)
        k = k.reshape(b, s, h, dk)
        v = v.reshape(b, s, h, dk)

        if cache is not None:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = (ck, cv)
        else:
            new_cache = None

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        if attn_bias is not None:
            logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(self.dtype)).reshape(b, s, d)
        out = nn.Dense(d, dtype=self.dtype, name="c_proj")(out)
        return out, new_cache


class GPT2Block(nn.Module):
    config: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, cache=None, cache_index=None):
        c = self.config
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_1")(x)
        attn, new_cache = GPT2Attention(c, dtype=self.dtype, name="attn")(y, attn_bias, cache, cache_index)
        x = x + attn
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * c.n_embd, dtype=self.dtype, name="c_fc")(y)
        y = _gelu_new(y)
        y = nn.Dense(c.n_embd, dtype=self.dtype, name="c_proj")(y)
        return x + y, new_cache


class GPT2Model(nn.Module):
    """Hidden-state GPT-2 over input embeddings (wte only used for token ids)."""

    config: GPT2Config = GPT2Config()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        position_offset: int | jnp.ndarray = 0,
        caches=None,
        cache_index=None,
    ):
        """inputs_embeds [B, S, D]; attention_mask [B, L] over the KV length
        (L == S without cache). Returns (hidden [B, S, D], new_caches)."""

        c = self.config
        b, s, _ = inputs_embeds.shape
        wpe = nn.Embed(c.n_positions, c.n_embd, dtype=self.dtype, name="wpe")
        positions = jnp.arange(s) + position_offset
        x = inputs_embeds.astype(self.dtype) + wpe(positions)[None]

        kv_len = caches[0][0].shape[1] if caches is not None else s
        # causal bias over absolute positions
        q_pos = positions[:, None]
        k_pos = jnp.arange(kv_len)[None, :]
        causal = (k_pos <= q_pos).astype(jnp.float32)
        bias = jnp.where(causal > 0, 0.0, jnp.finfo(jnp.float32).min)[None, None]
        if attention_mask is not None:
            pad = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(jnp.float32).min
            bias = bias + pad[:, None, None, :]

        new_caches = []
        for i in range(c.n_layer):
            cache = caches[i] if caches is not None else None
            x, nc = GPT2Block(c, dtype=self.dtype, name=f"h_{i}")(x, bias, cache, cache_index)
            new_caches.append(nc)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_f")(x)
        return x, (new_caches if caches is not None else None)


def generate_hidden_states(
    model: GPT2Model,
    params,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    max_new_tokens: Optional[int] = None,
) -> jnp.ndarray:
    """AR hidden-state generation (reference generate_language_model,
    pipeline_audioldm2.py:231-270): each step feeds the previous step's last
    hidden state back as the next input embedding. Returns the last
    ``max_new_tokens`` hidden states [B, max_new_tokens, D].

    Compiles to prefill + an unrolled/scanned decode over a fixed KV cache.
    """

    c = model.config
    steps = max_new_tokens or c.max_new_tokens
    b, s0, d = inputs_embeds.shape
    h = c.n_head
    total = s0 + steps

    # prefill with preallocated caches
    zeros = jnp.zeros((b, total, h, d // h), dtype=inputs_embeds.dtype)
    caches = [(zeros, zeros) for _ in range(c.n_layer)]
    mask0 = attention_mask if attention_mask is not None else jnp.ones((b, s0), dtype=jnp.int32)
    full_mask = jnp.concatenate(
        [mask0.astype(jnp.int32), jnp.zeros((b, steps), dtype=jnp.int32)], axis=1
    )

    hidden, caches = model.apply(
        {"params": params},
        inputs_embeds,
        attention_mask=full_mask,
        position_offset=0,
        caches=caches,
        cache_index=0,
    )
    last = hidden[:, -1:, :]

    def step(carry, i):
        last, caches, mask = carry
        mask = mask.at[:, s0 + i].set(1)
        out, caches = model.apply(
            {"params": params},
            last,
            attention_mask=mask,
            position_offset=s0 + i,
            caches=caches,
            cache_index=s0 + i,
        )
        return (out, caches, mask), out[:, 0]

    # The reference returns [prefill_last, decode_1, ..., decode_{steps-1}]:
    # the appended element of iteration k is the *input* of iteration k+1, so
    # only steps-1 decode forwards contribute to the returned window.
    (_, _, _), outs = jax.lax.scan(
        step, (last, caches, full_mask), jnp.arange(steps - 1)
    )
    if steps == 1:
        return last
    return jnp.concatenate([last, jnp.transpose(outs, (1, 0, 2))], axis=1)
