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
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


_PALLAS_SELF_MIN_SEQ = 512
# Kernel selection, measured end-to-end on v5e (r1):
#  * generic jax flash_attention kernel: 1.09 -> 0.51 clips/s REGRESSION
#    (head_dims 32/48/80 pad to 128 lanes; block pipeline loses at these sizes);
#  * ops/pallas_self_attention (whole-KV-in-VMEM single pass): 1.07 ms vs
#    1.32 ms XLA per 1000-token site — routed in for S >= 512 only; at
#    smaller S the d-padding makes it slower than XLA's streamed softmax.


def self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Self-attention [B, S, H, D]; long sequences use the single-pass
    whole-KV Pallas kernel on TPU (see selection note above)."""

    b, s, h, d = q.shape
    if s < _PALLAS_SELF_MIN_SEQ or not _on_tpu():
        return sdpa(q, k, v)

    if d <= 128 and 128 % d == 0 and h % (128 // d) == 0:
        # head-packed kernel: G = 128/d heads share one 128-lane K/V copy
        from ap_adapter_tpu.ops.pallas_packed_attention import packed_self_attention_vjp

        return packed_self_attention_vjp(q, k, v)

    # whole-KV kernel needs K/V + a logits tile resident in VMEM:
    # ~ 2*sp*dp*4 + tile_q*sp*4 bytes; cap well under the ~16 MB budget.
    sp = ((s + 511) // 512) * 512
    dp = ((d + 127) // 128) * 128
    vmem_bytes = 2 * sp * dp * 4 + 512 * sp * 4 + 2 * 512 * dp * 4
    if vmem_bytes >= 8 * 1024 * 1024:
        return sdpa(q, k, v)

    from ap_adapter_tpu.ops.pallas_self_attention import pallas_self_attention_vjp

    return pallas_self_attention_vjp(q, k, v)


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
