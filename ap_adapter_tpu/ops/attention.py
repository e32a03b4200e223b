"""Attention primitives.

Convention: q/k/v are [batch, seq, heads, head_dim] (flax layout — the last
two dims map to (sublane, lane) tiles on the MXU without transposes).

``dual_kv_attention`` is the TPU-native form of the reference's decoupled
IP-adapter cross-attention (APadapter/ap_adapter/attention_processor.py:
347-470): one attention over the text/GPT-2 KV, one over the audio (adapter)
KV, combined as ``text + scale * audio``. XLA fuses the two softmax-matmul
chains; a fused Pallas kernel is available in ops/pallas_attention.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [B, Sq, H, D], k/v: [B, Sk, H, D].
    mask: broadcastable to [B, H, Sq, Sk]; boolean (True = attend) or additive.
    Softmax is computed in fp32 regardless of input dtype.
    """

    dtype = q.dtype
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    # store logits in the input precision for half-precision models: the
    # [B,H,Sq,Sk] tensor is the dominant HBM traffic at long Sq (profiled
    # ~0.5 GB/site fp32 at Sq=1000); the MXU still accumulates in fp32 and
    # the softmax below is computed in fp32.
    acc = jnp.float32 if dtype == jnp.float32 else dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=acc)
    logits = logits * jnp.asarray(scale, acc)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, jnp.asarray(jnp.finfo(jnp.float32).min, acc))
        else:
            logits = logits + mask.astype(acc)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _on_tpu() -> bool:
    try:
        import jax.extend as jex

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


_FLASH_MIN_SEQ = 512
# Measured end-to-end on v5e (r1): routing the UNet's 1000-token self-attention
# through the generic TPU flash kernel REGRESSED 1.09 -> 0.51 clips/s — the
# head_dims here (32/48/80) pad to 128 lanes inside the kernel, wasting most
# of the MXU, while XLA's materialized softmax streams well. Flash routing is
# therefore opt-in; a head-dim-packed custom kernel is the round-2 follow-up.
_FLASH_ENABLED = False


def self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Self-attention [B, S, H, D]; optionally routes long sequences to the
    TPU flash-attention Pallas kernel (see _FLASH_ENABLED note)."""

    b, s, h, d = q.shape
    if not _FLASH_ENABLED or s < _FLASH_MIN_SEQ or not _on_tpu():
        return sdpa(q, k, v)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    spad = ((s + 511) // 512) * 512
    pad = spad - s

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, S, D]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qt, kt, vt = prep(q), prep(k), prep(v)
    if pad:
        seg = jnp.concatenate(
            [jnp.ones((b, s), jnp.int32), jnp.full((b, pad), 2, jnp.int32)], axis=1
        )
        segment_ids = fa.SegmentIds(seg, seg)
    else:
        segment_ids = None
    out = fa.flash_attention(qt, kt, vt, segment_ids=segment_ids, sm_scale=float(d) ** -0.5)
    out = out[:, :, :s]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def dual_kv_attention(
    q: jnp.ndarray,
    k_text: jnp.ndarray,
    v_text: jnp.ndarray,
    k_ip: jnp.ndarray,
    v_ip: jnp.ndarray,
    ip_scale: jnp.ndarray | float,
    mask_text: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Decoupled dual-KV cross-attention: attn(q, text) + s * attn(q, ip).

    The audio (ip) branch is unmasked, matching the reference
    (attention_processor.py:443-445 passes attn_mask=None).
    """

    out_text = sdpa(q, k_text, v_text, mask_text)
    out_ip = sdpa(q, k_ip, v_ip)
    scale = jnp.asarray(ip_scale, dtype=out_ip.dtype)
    return out_text + scale * out_ip


def strip_adapter_tokens(context: jnp.ndarray, num_tokens: int) -> jnp.ndarray:
    """ControlNet-style context: drop the trailing ``num_tokens`` adapter
    tokens and attend text-only — the behavior of the reference's
    ``CNAttnProcessor(2_0)`` (attention_processor.py:473-623, unused by any
    entry point but part of the API surface)."""

    return context[:, : context.shape[1] - num_tokens]


def mask_to_bias(mask: Optional[jnp.ndarray], num_query: int) -> Optional[jnp.ndarray]:
    """[B, Sk] {0,1} padding mask -> [B, 1, 1, Sk] additive fp32 bias.

    Matches the reference's -10000 bias convention
    (modeling_audioldm2.py:741-747).
    """

    if mask is None:
        return None
    bias = (1.0 - mask.astype(jnp.float32)) * -10000.0
    return bias[:, None, None, :]
