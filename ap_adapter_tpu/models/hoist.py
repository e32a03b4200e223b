"""Step-invariant hoisting for the DDIM denoise loop (inference serving).

XLA's while-loop LICM does not hoist loop-invariant work out of the denoise
``lax.scan`` (measured r1-r3, docs/PERF.md: per-step param casts, per-step
weight re-padding/re-quantization and the cross-attention K/V projections all
re-execute on every one of the 50 steps). The reference pays the same cost in
eager PyTorch — its denoise loop re-projects the conditioning K/V at every
UNet call (pipeline_audioldm2.py:1001-1031 -> attention_processor.py:406-445).

This module precomputes, ONCE per generate call, everything in the UNet step
that depends only on (weights, conditioning, timestep schedule):

  * every cross-attention site's K/V — text stream and adapter audio stream —
    already in the fused kernel's padded-head lane layout
    (ops/pallas_fused_cross.fused_ln_cross_attention_kv consumes them),
  * the T5-stream additive attention bias, padded to the kernel's key rows,
  * the per-resnet time-embedding projection rows for the WHOLE timestep
    schedule ([T, C] tables the scan slices per step), replacing the
    sin/cos -> MLP -> 22 per-resnet Dense chains inside the loop.

Everything here reads the UNet param tree directly (pure jnp — no module
apply), so the step graph never touches the frozen projection weights at all.
Site names/paths mirror models/unet.py; keep the two in sync.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import UNetConfig
from ap_adapter_tpu.models.layers import get_timestep_embedding


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attn_group_names(c: UNetConfig) -> Dict[str, int]:
    """{group module name: channel count} in models/unet.py naming."""

    ch = c.block_out_channels
    names: Dict[str, int] = {}
    for bi in range(len(ch)):
        if c.down_block_has_attn[bi]:
            for li in range(c.layers_per_block):
                names[f"down_{bi}_attn_{li}"] = ch[bi]
    names["mid_attn_0"] = ch[-1]
    reversed_ch = list(reversed(ch))
    for bi in range(len(ch)):
        if c.up_block_has_attn[bi]:
            for li in range(c.layers_per_block + 1):
                names[f"up_{bi}_attn_{li}"] = reversed_ch[bi]
    return names


def resnet_names(c: UNetConfig) -> list:
    """Resnet module names in models/unet.py naming (all carry time_emb_proj)."""

    names = []
    for bi in range(len(c.block_out_channels)):
        for li in range(c.layers_per_block):
            names.append(f"down_{bi}_resnet_{li}")
    names += ["mid_resnet_0", "mid_resnet_1"]
    for bi in range(len(c.block_out_channels)):
        for li in range(c.layers_per_block + 1):
            names.append(f"up_{bi}_resnet_{li}")
    return names


def validate_site_names(unet_params: Dict[str, Any], c: UNetConfig) -> None:
    """Structural check of the hoist<->unet naming contract.

    attn_group_names()/resnet_names() mirror models/unet.py's module names by
    string; a rename there would otherwise desynchronize silently (KeyError
    deep inside a jit trace at best, wrong hoisting at worst). Called at
    pipeline build — fails loudly with the missing names."""

    missing = [n for n in attn_group_names(c) if n not in unet_params]
    missing += [
        n for n in resnet_names(c)
        if n not in unet_params or "time_emb_proj" not in unet_params[n]
    ]
    for n in ("time_embedding_linear_1", "time_embedding_linear_2"):
        if n not in unet_params:
            missing.append(n)
    if missing:
        raise ValueError(
            "models/hoist.py site names are out of sync with the UNet param "
            f"tree — missing: {sorted(missing)}. attn_group_names()/"
            "resnet_names() must mirror models/unet.py module names."
        )


def _pad_heads(k: jnp.ndarray, heads: int, d_in: int, d_p: int) -> jnp.ndarray:
    """[..., heads*d_in] -> [..., heads*d_p] (zero lanes per head)."""

    if d_p == d_in:
        return k
    shp = k.shape[:-1]
    k = k.reshape(*shp, heads, d_in)
    k = jnp.pad(k, [(0, 0)] * (k.ndim - 1) + [(0, d_p - d_in)])
    return k.reshape(*shp, heads * d_p)


def _project(ctx: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """ctx [B, S, Dc] @ w [L, Dc, inner] -> [L, B, S, inner], fp32 accum
    then cast — the same math the fused kernel runs at j == 0."""

    out = jnp.einsum("bsd,ldc->lbsc", jnp.asarray(ctx, dtype), w,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def _pad_rows(k: jnp.ndarray, skp: int) -> jnp.ndarray:
    s = k.shape[2]
    if s == skp:
        return k
    return jnp.pad(k, ((0, 0), (0, 0), (0, skp - s), (0, 0)))


def kv_row_pad(sk: int) -> int:
    """Key rows are padded to 16 (not 8): bf16 blocks need 16-row sublane
    alignment when the rows sit in a grid-blocked input operand."""

    return _round_up(max(sk, 16), 16)


def precompute_cross_kv(
    unet_params: Dict[str, Any],
    c: UNetConfig,
    ehs0: jnp.ndarray,             # [B, S0, 768] GPT-2 (+ AudioMAE) stream
    ehs1: jnp.ndarray,             # [B, S1, 1024] T5 stream
    t5_mask: Optional[jnp.ndarray],  # [B, S1] {0,1} or None
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """All cross-attention K/V in kernel layout.

    Returns {group_name: {"attentions_1": (k, v, ki, vi), "attentions_2":
    (k, v, None, None)}, "__bias1__": [B, 1, skp1] fp32 or None} where each
    array is [L, B, skp, heads*d_p] (stacked over the per-T2D transformer
    blocks exactly like the scanned params they were projected with).
    """

    heads = c.num_attention_heads
    num_ip = c.adapter_num_tokens
    if c.cn_text_only:
        # the UNet strips ehs0 to its text tokens AFTER this precompute
        # would have projected the full context — rows would disagree
        raise ValueError("K/V hoisting is not supported for cn_text_only "
                         "(ControlNet-branch) UNets; pass ctx_kv=None")

    from ap_adapter_tpu.ops.pallas_fused_block import _pad_head_dim

    out: Dict[str, Any] = {}
    s1 = ehs1.shape[1]
    if t5_mask is not None:
        bias1 = (1.0 - t5_mask.astype(jnp.float32)) * -10000.0
        bias1 = jnp.pad(bias1, ((0, 0), (0, kv_row_pad(s1) - s1)))[:, None, :]
    else:
        bias1 = None
    out["__bias1__"] = bias1

    for group, ch in attn_group_names(c).items():
        d_in = ch // heads
        d_p = _pad_head_dim(d_in) or d_in
        gp = unet_params[group]
        entry: Dict[str, Any] = {}
        # mirror AttentionGroup's stream routing exactly (unet_blocks.py:795):
        # idx<=1 -> stream0 (GPT-2+AudioMAE), idx>1 -> stream1 (T5) — every
        # non-None dim gets a kv entry, so no site ever receives bias_pre
        # without its hoisted K/V
        for idx, dim in enumerate(c.cross_attention_dims):
            if dim is None:
                continue
            ctx = ehs0 if idx <= 1 else ehs1
            ap = gp[f"attentions_{idx}"]["transformer_blocks"]["attn2"]
            wk = jnp.asarray(ap["to_k"]["kernel"], dtype)   # [L, Dc, inner]
            wv = jnp.asarray(ap["to_v"]["kernel"], dtype)
            # same condition AttentionGroup passes as use_adapter
            # (unet_blocks.py:808) — by dim, whichever stream it rides
            adapter = dim == c.adapter_cross_attention_dim
            if adapter and ctx.shape[1] > num_ip:
                text = ctx[:, :num_ip]
                ip = ctx[:, num_ip:]
            else:
                text, ip = ctx, None
            sk_text = text.shape[1]
            k = _pad_rows(_pad_heads(_project(text, wk, dtype), heads, d_in, d_p),
                          kv_row_pad(sk_text))
            v = _pad_rows(_pad_heads(_project(text, wv, dtype), heads, d_in, d_p),
                          kv_row_pad(sk_text))
            ki = vi = None
            if adapter and ip is not None:
                wki = jnp.asarray(ap["to_k_ip"]["kernel"], dtype)
                wvi = jnp.asarray(ap["to_v_ip"]["kernel"], dtype)
                ki = _pad_rows(_pad_heads(_project(ip, wki, dtype), heads, d_in, d_p),
                               kv_row_pad(ip.shape[1]))
                vi = _pad_rows(_pad_heads(_project(ip, wvi, dtype), heads, d_in, d_p),
                               kv_row_pad(ip.shape[1]))
            entry[f"attentions_{idx}"] = (k, v, ki, vi)
        out[group] = entry
    return out


def precompute_temb_rows(
    unet_params: Dict[str, Any],
    c: UNetConfig,
    timesteps: np.ndarray,  # [T] the full inference schedule
    dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Per-resnet time-embedding rows for the whole schedule.

    Returns {resnet_name: [T, C]} — silu(time_mlp(sincos(t))) @ W_r + b_r,
    the exact chain models/unet.py + ResnetBlock2D run per step, computed
    once for all T steps (the rows are identical across the batch: the UNet
    broadcasts one t over the batch).
    """

    ts = jnp.asarray(np.asarray(timesteps), jnp.float32)
    emb = get_timestep_embedding(
        ts, c.block_out_channels[0],
        flip_sin_to_cos=c.flip_sin_to_cos, downscale_freq_shift=c.freq_shift,
    ).astype(dtype)

    def dense(x, p):
        y = x @ jnp.asarray(p["kernel"], dtype)
        return y + jnp.asarray(p["bias"], dtype)

    temb = dense(emb, unet_params["time_embedding_linear_1"])
    temb = jax.nn.silu(temb)
    temb = dense(temb, unet_params["time_embedding_linear_2"])
    st = jax.nn.silu(temb)  # shared across every resnet's time_emb_proj
    return {name: dense(st, unet_params[name]["time_emb_proj"])
            for name in resnet_names(c)}
