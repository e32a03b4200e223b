"""Flax building blocks for the AudioLDM2 UNet (NHWC, diffusers semantics).

TPU-native re-implementation of the diffusers primitives the reference UNet is
assembled from (modeling_audioldm2.py:22-40): ResnetBlock2D,
Down/Upsample2D, Transformer2DModel (+BasicTransformerBlock, GEGLU
feed-forward), and the decoupled-KV adapter attention
(APadapter/ap_adapter/attention_processor.py:297-470) folded directly into the
cross-attention module — a functional param-tree design instead of the
reference's mutable attention-processor registry.

All convolutions are NHWC (TPU-native layout); weight names mirror diffusers
for 1:1 checkpoint conversion.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

import os as _os

from ap_adapter_tpu.ops.attention import _on_tpu, sdpa, self_attention

# A/B hook: AP_FUSE_SMALL_ATTN=0 restores the r2 routing (fused attention
# kernels only at the >=512-token sites; 252/64-token sites stay XLA)
_SMALL_ATTN_MIN_N = 64 if _os.environ.get("AP_FUSE_SMALL_ATTN", "1") == "1" else 512

# A/B: GroupNorm statistics without the fp32 promotion (AP_GN_BF16=1) — the
# bf16->fp32 convert feeding the GN reduces is 14.1 ms/step of convert_reduce
# in the serving trace (docs/PERF.md r4); this flag measures whether dropping
# it buys end-to-end clips/s at acceptable log-mel delta. Applies to the
# UNet's XLA GroupNorms only (VAE/vocoder untouched).
_GN_F32_STATS = _os.environ.get("AP_GN_BF16", "0") != "1"


class GroupNormParams(nn.Module):
    """Raw GroupNorm scale/bias (same param tree as nn.GroupNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class ConvParams(nn.Module):
    """Raw conv weights (same param tree as nn.Conv: kernel [kh, kw, in, out]
    + bias) — exposed as arrays so fused kernels consume them directly."""

    features: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self, in_features: int):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv -> (+temb) -> GN -> silu -> conv (+shortcut).

    ``use_pallas_resnet`` routes the WHOLE block to one fused Pallas kernel
    (ops/pallas_resnet.py: both GN+SiLU passes, both 3x3 convs, the
    time-embedding add and the shortcut — the slab is read once and written
    once). Falls back per-site when the slab exceeds the VMEM budget.

    ``use_pallas_gn`` routes just the GN+SiLU pairs to the fused GN kernel
    (ops/pallas_groupnorm.py). Opt-in: measured at parity-or-slower vs XLA's
    fused GroupNorm at UNet shapes (docs/PERF.md negative results), kept for
    shapes/backends where the one-pass VMEM read wins.
    """

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_temb: bool = True
    use_pallas_gn: bool = False
    use_pallas_resnet: bool = False
    dtype: Any = jnp.float32

    def _gn_silu(self, h: jnp.ndarray, name: str) -> jnp.ndarray:
        b, hh, ww, c = h.shape
        # small slabs take the whole-slab kernel; big (level-0) slabs route
        # to the two-phase tiled variant inside fused_group_norm
        if self.use_pallas_gn and _on_tpu():
            from ap_adapter_tpu.ops.pallas_groupnorm import group_norm_silu

            scale, bias = GroupNormParams(c, name=name)()
            y = group_norm_silu(h.reshape(b, hh * ww, c), scale, bias,
                                self.groups, self.eps, act=True)
            return y.reshape(b, hh, ww, c).astype(self.dtype)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name=name,
                         force_float32_reductions=_GN_F32_STATS)(h)
        return nn.silu(h)

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 temb_pre: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_ch = x.shape[-1]
        out_ch = self.out_channels

        if self.use_pallas_resnet and _on_tpu():
            from ap_adapter_tpu.ops.pallas_resnet import (
                fused_resnet_block_vjp,
                fused_resnet_fits,
            )

            if fused_resnet_fits(x.shape[1], x.shape[2], in_ch, out_ch,
                                 itemsize=jnp.dtype(self.dtype).itemsize):
                g1s, g1b = GroupNormParams(in_ch, name="norm1")()
                w1, b1 = ConvParams(out_ch, (3, 3), name="conv1")(in_ch)
                tp = None
                if self.use_temb and temb_pre is not None:
                    tp = jnp.broadcast_to(
                        temb_pre.astype(self.dtype)[None, :], (x.shape[0], out_ch))
                elif self.use_temb and temb is not None:
                    tp = nn.Dense(out_ch, dtype=self.dtype,
                                  name="time_emb_proj")(nn.silu(temb))
                g2s, g2b = GroupNormParams(out_ch, name="norm2")()
                w2, b2 = ConvParams(out_ch, (3, 3), name="conv2")(out_ch)
                wsc = bsc = None
                if in_ch != out_ch:
                    wsc, bsc = ConvParams(out_ch, (1, 1), name="conv_shortcut")(in_ch)
                return fused_resnet_block_vjp(
                    x.astype(self.dtype), tp, g1s, g1b, w1, b1, g2s, g2b,
                    w2, b2, wsc, bsc, self.groups, self.eps)

        h = self._gn_silu(x, "norm1")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_temb and temb_pre is not None:
            # per-step row from the hoisted [T, C] table (models/hoist.py):
            # identical across the batch, broadcast here
            h = h + temb_pre.astype(self.dtype)[None, None, None, :]
        elif self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = self._gn_silu(h, "norm2")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=self.padding,
            dtype=self.dtype, name="conv",
        )(x)


import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=64)
def _nearest_select_matrix(n_in: int, n_out: int) -> _np.ndarray:
    """0/1 selection matrix [n_out, n_in]: out[i] = in[floor(i*n_in/n_out)].

    Matches torch/jax nearest-neighbor interpolation. Applied as a matmul so
    upsampling stays on the MXU instead of lowering to a TPU-hostile gather.
    """

    idx = (_np.arange(n_out) * n_in) // n_out
    m = _np.zeros((n_out, n_in), dtype=_np.float32)
    m[_np.arange(n_out), idx] = 1.0
    return m


def nearest_resize_2d(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """Nearest-neighbor resize of [B, H, W, C] to (th, tw), gather-free."""

    b, h, w, c = x.shape
    if th == 2 * h and tw == 2 * w:
        # exact 2x: broadcast-repeat (cheapest path, identical to nearest)
        x = jnp.repeat(x, 2, axis=1)
        return jnp.repeat(x, 2, axis=2)
    if th != h:
        m = jnp.asarray(_nearest_select_matrix(h, th), dtype=x.dtype)
        x = jnp.einsum("oh,bhwc->bowc", m, x)
    if tw != w:
        m = jnp.asarray(_nearest_select_matrix(w, tw), dtype=x.dtype)
        x = jnp.einsum("ow,bhwc->bhoc", m, x)
    return x


class Upsample2D(nn.Module):
    """Nearest 2x (or to an explicit ``output_size`` — diffusers passes the
    next skip's spatial dims when shapes are odd) followed by a 3x3 conv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, output_size=None) -> jnp.ndarray:
        b, h, w, c = x.shape
        th, tw = output_size if output_size is not None else (h * 2, w * 2)
        x = nearest_resize_2d(x, th, tw)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class DenseParams(nn.Module):
    """Raw Dense weights (same param tree as nn.Dense: kernel[, bias]) —
    exposed as arrays so fused kernels can consume them directly."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return kernel, bias


class LayerNormParams(nn.Module):
    """Raw LayerNorm scale/bias (same param tree as nn.LayerNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def layer_norm(x: jnp.ndarray, scale, bias, eps: float = 1e-5,
               dtype=None) -> jnp.ndarray:
    """nn.LayerNorm math from raw params (fp32 statistics)."""

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype or x.dtype)


def _dense(x, kernel, bias, dtype):
    y = jnp.asarray(x, dtype) @ jnp.asarray(kernel, dtype)
    if bias is not None:
        y = y + jnp.asarray(bias, dtype)
    return y


def _fused_block_tile_q(s: int, c: int, heads: int) -> int:
    """Largest query tile whose fp32 logits block stays within ~4 MB VMEM."""

    g = 128 // (c // heads)
    sp = ((s + 63) // 64) * 64
    for tq in (256, 128, 64):
        if g * tq * sp * 4 <= 4 * 1024 * 1024:
            return tq
    return 64


class CrossAttention(nn.Module):
    """diffusers ``Attention`` with an optional decoupled audio-KV branch.

    With ``use_adapter`` and a provided context, the context is split at
    ``num_ip_tokens`` (first 8 = GPT-2 tokens -> text KV, rest = AudioMAE
    tokens -> adapter KV) and the outputs combined as text + ip_scale * audio,
    matching reference attention_processor.py:400-454. The audio branch is
    unmasked (reference :443-445).

    ``pre_ln``: optional (scale, bias) of the preceding LayerNorm. When given,
    this module computes ``x + attn(LN(x))`` — which lets the hot
    self-attention sites route to the fully-fused Pallas block kernel
    (ops/pallas_fused_block.py: LN, q/k/v, attention, out-proj and residual
    in one kernel; q/k/v never touch HBM).
    """

    heads: int
    dim_head: int
    out_dim: int
    use_adapter: bool = False
    num_ip_tokens: int = 8
    use_pallas: bool = False
    use_int8: bool = False
    use_weight_prep: bool = False
    # tensor-parallel serving: keep every site on the XLA einsum path so
    # GSPMD can partition it (UNetConfig.force_xla_core)
    force_xla: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask_bias: Optional[jnp.ndarray] = None,
        ip_scale: jnp.ndarray | float = 0.0,
        pre_ln: Optional[tuple] = None,
        kv_pre: Optional[tuple] = None,
        bias_pre: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        b, n, c_in = x.shape
        is_cross = context is not None

        wq, _ = DenseParams(inner, use_bias=False, name="to_q")(c_in)
        ctx_dim = context.shape[-1] if is_cross else c_in
        wk, _ = DenseParams(inner, use_bias=False, name="to_k")(ctx_dim)
        wv, _ = DenseParams(inner, use_bias=False, name="to_v")(ctx_dim)
        wo, bo = DenseParams(self.out_dim, name="to_out")(inner)

        d = self.dim_head
        from ap_adapter_tpu.ops.pallas_fused_block import (
            _pad_head_dim, _pad_heads_in, _pad_heads_out, fused_block_applicable)

        d_p = _pad_head_dim(d)

        fused_ok = (
            pre_ln is not None and not is_cross and mask_bias is None
            and not self.use_adapter
            # head dims that don't divide 128 (the 48/80-dim levels) run at
            # an internal padded width — the padding is folded into the
            # projection weights, so every site with >=64 tokens fuses
            and n >= _SMALL_ATTN_MIN_N and inner % 128 == 0
            and fused_block_applicable(self.heads, d)
            and inner == c_in and self.out_dim == c_in
            and _on_tpu() and not self.force_xla
        )
        if fused_ok and self.use_weight_prep and not self.use_int8 \
                and d_p is not None and d_p != d:
            # serving-prep: head padding folded into the weights ONCE at
            # pipeline build (the "quant" collection, same plumbing as int8)
            # — XLA re-pads every DDIM step otherwise (no while-loop LICM)
            from ap_adapter_tpu.ops.pallas_fused_block import fused_ln_self_attention

            pv = self.variable(
                "quant", "attn_prep",
                lambda: (
                    _pad_heads_in(jnp.asarray(wq, self.dtype), self.heads, d, d_p),
                    _pad_heads_in(jnp.asarray(wk, self.dtype), self.heads, d, d_p),
                    _pad_heads_in(jnp.asarray(wv, self.dtype), self.heads, d, d_p),
                    _pad_heads_out(jnp.asarray(wo, self.dtype), self.heads, d, d_p),
                ))
            wq_p, wk_p, wv_p, wo_p = pv.value
            scale, bias = pre_ln
            return fused_ln_self_attention(
                x, scale, bias, wq_p, wk_p, wv_p, wo_p,
                jnp.asarray(bo, self.dtype), self.heads, 1e-5,
                _fused_block_tile_q(n, inner, self.heads), prepadded=True,
            )
        if fused_ok and self.use_int8:
            # W8A8 serving mode (inference-only — no VJP is defined): int8
            # q/out projections, everything else bf16 (ops/pallas_int8.py
            # docstring has the measured shape-by-shape rationale). Weights
            # are quantized ONCE into the "quant" collection at pipeline
            # build (pipeline.build_quant_collection) — never in the step.
            from ap_adapter_tpu.ops.pallas_int8 import (
                fused_ln_self_attention_int8, quantize_attention_weights)

            qw = self.variable(
                "quant", "attn_qw",
                lambda: quantize_attention_weights(
                    jnp.asarray(wq, jnp.float32), jnp.asarray(wk, jnp.float32),
                    jnp.asarray(wv, jnp.float32), jnp.asarray(wo, jnp.float32),
                    self.heads, kv_dtype=self.dtype))
            wq8, sq, wk_p, wv_p, wo8, so = qw.value
            scale, bias = pre_ln
            return fused_ln_self_attention_int8(
                x, scale, bias, wq8, sq,
                jnp.asarray(wk_p, self.dtype), jnp.asarray(wv_p, self.dtype),
                wo8, so, jnp.asarray(bo, self.dtype), self.heads, 1e-5,
                _fused_block_tile_q(n, inner, self.heads),
            )
        if fused_ok:
            from ap_adapter_tpu.ops.pallas_fused_block import fused_ln_self_attention_vjp

            scale, bias = pre_ln
            return fused_ln_self_attention_vjp(
                x, scale, bias,
                jnp.asarray(wq, self.dtype), jnp.asarray(wk, self.dtype),
                jnp.asarray(wv, self.dtype), jnp.asarray(wo, self.dtype),
                jnp.asarray(bo, self.dtype), self.heads, 1e-5,
                # query tile sized so the fp32 logits block fits VMEM
                _fused_block_tile_q(n, inner, self.heads),
            )

        fused_kv_ok = (
            kv_pre is not None and pre_ln is not None and is_cross
            and n >= _SMALL_ATTN_MIN_N and inner % 128 == 0
            and fused_block_applicable(self.heads, d)
            and inner == c_in and self.out_dim == c_in
            and _on_tpu() and not self.force_xla
        )
        if fused_kv_ok and not self.use_int8:
            # hoisted-K/V serving route (models/hoist.py): the conditioning
            # K/V were projected ONCE before the DDIM scan; the kernel keeps
            # only the x-dependent work
            from ap_adapter_tpu.ops.pallas_fused_cross import fused_ln_cross_attention_kv

            k_pre, v_pre, ki_pre, vi_pre = kv_pre
            has_ip = ki_pre is not None
            sk_total = context.shape[1]
            sk_text = self.num_ip_tokens if has_ip else sk_total
            sk_ip = sk_total - self.num_ip_tokens if has_ip else 0
            if self.use_weight_prep and d_p is not None and d_p != d:
                pv = self.variable(
                    "quant", "cross_prep",
                    lambda: (
                        _pad_heads_in(jnp.asarray(wq, self.dtype), self.heads, d, d_p),
                        _pad_heads_out(jnp.asarray(wo, self.dtype), self.heads, d, d_p),
                    ))
                wq_p, wo_p = pv.value
            elif d_p is not None and d_p != d:
                wq_p = _pad_heads_in(jnp.asarray(wq, self.dtype), self.heads, d, d_p)
                wo_p = _pad_heads_out(jnp.asarray(wo, self.dtype), self.heads, d, d_p)
            else:
                wq_p = jnp.asarray(wq, self.dtype)
                wo_p = jnp.asarray(wo, self.dtype)
            scale, bias = pre_ln
            return fused_ln_cross_attention_kv(
                x, k_pre, v_pre, scale, bias, wq_p, wo_p,
                jnp.asarray(bo, self.dtype), self.heads, sk_text,
                ki=ki_pre, vi=vi_pre, sk_ip=sk_ip, ip_scale=ip_scale,
                bias_pre=bias_pre, eps=1e-5,
            )

        fused_cross_ok = (
            pre_ln is not None and is_cross
            and n >= _SMALL_ATTN_MIN_N and inner % 128 == 0
            and fused_block_applicable(self.heads, d)
            and inner == c_in and self.out_dim == c_in
            # text-only conditioning leaves the audio branch EMPTY; the XLA
            # path contracts over zero keys to exact zeros — keep it there.
            # num_ip_tokens must be 8-aligned: the kernel slices the padded
            # context at [num_ip, num_ip + round_up(sk_ip, 8)), which can
            # overrun the padded rows otherwise (default 8 is aligned).
            and (not self.use_adapter
                 or (context.shape[1] > self.num_ip_tokens
                     and self.num_ip_tokens % 8 == 0))
            and _on_tpu() and not self.force_xla
        )
        if fused_cross_ok and self.use_int8:
            # W8A8 serving mode: the [S,C]-sized q/out projections in int8
            # (k/v + QK/PV stay bf16 — contexts are tiny). Weights quantized
            # once into the "quant" collection; ip K/V weights pre-padded
            # alongside.
            from ap_adapter_tpu.ops.pallas_int8 import (
                fused_ln_cross_attention_int8, quantize_attention_weights)
            from ap_adapter_tpu.ops.pallas_fused_block import (
                _pad_head_dim, _pad_heads_in)

            qw = self.variable(
                "quant", "cross_qw",
                lambda: quantize_attention_weights(
                    jnp.asarray(wq, jnp.float32), jnp.asarray(wk, jnp.float32),
                    jnp.asarray(wv, jnp.float32), jnp.asarray(wo, jnp.float32),
                    self.heads, kv_dtype=self.dtype))
            wq8, sq, wk_p, wv_p, wo8, so = qw.value
            wki = wvi = None
            if self.use_adapter:
                wki_raw, _ = DenseParams(inner, use_bias=False, name="to_k_ip")(ctx_dim)
                wvi_raw, _ = DenseParams(inner, use_bias=False, name="to_v_ip")(ctx_dim)
                d_p = _pad_head_dim(d)
                if d_p != d:
                    wki_raw = _pad_heads_in(wki_raw, self.heads, d, d_p)
                    wvi_raw = _pad_heads_in(wvi_raw, self.heads, d, d_p)
                wki = jnp.asarray(wki_raw, self.dtype)
                wvi = jnp.asarray(wvi_raw, self.dtype)
            # hoisted-bias fallback: if the UNet suppressed mask_bias in
            # favor of the precomputed padded rows, recover [B, Sk] from them
            mb = mask_bias[:, 0, 0, :] if mask_bias is not None else (
                bias_pre[:, 0, : context.shape[1]] if bias_pre is not None else None)
            scale, bias = pre_ln
            return fused_ln_cross_attention_int8(
                x, jnp.asarray(context, self.dtype), scale, bias,
                wq8, sq, jnp.asarray(wk_p, self.dtype),
                jnp.asarray(wv_p, self.dtype), wo8, so,
                jnp.asarray(bo, self.dtype), self.heads,
                wk_ip=wki, wv_ip=wvi, ip_scale=ip_scale,
                num_ip_tokens=self.num_ip_tokens, mask_bias=mb, eps=1e-5,
            )
        if fused_cross_ok:
            from ap_adapter_tpu.ops.pallas_fused_cross import fused_ln_cross_attention_vjp

            wki = wvi = None
            if self.use_adapter:
                wki_raw, _ = DenseParams(inner, use_bias=False, name="to_k_ip")(ctx_dim)
                wvi_raw, _ = DenseParams(inner, use_bias=False, name="to_v_ip")(ctx_dim)
                wki = jnp.asarray(wki_raw, self.dtype)
                wvi = jnp.asarray(wvi_raw, self.dtype)
            # [B,1,1,Sk] additive bias -> [B, Sk]; same hoisted-bias fallback
            # as the int8 route (a site passed bias_pre but no kv_pre)
            mb = mask_bias[:, 0, 0, :] if mask_bias is not None else (
                bias_pre[:, 0, : context.shape[1]] if bias_pre is not None else None)
            scale, bias = pre_ln
            return fused_ln_cross_attention_vjp(
                x, jnp.asarray(context, self.dtype), scale, bias,
                jnp.asarray(wq, self.dtype), jnp.asarray(wk, self.dtype),
                jnp.asarray(wv, self.dtype), jnp.asarray(wo, self.dtype),
                jnp.asarray(bo, self.dtype), self.heads,
                wki, wvi, ip_scale, self.num_ip_tokens, mb, 1e-5,
            )

        residual = None
        if pre_ln is not None:
            residual = x
            x = layer_norm(x, pre_ln[0], pre_ln[1], dtype=self.dtype)

        if is_cross and self.use_adapter:
            ctx = context[:, : self.num_ip_tokens]
            ip_ctx = context[:, self.num_ip_tokens :]
        else:
            ctx = context if is_cross else x
            ip_ctx = None

        if mask_bias is None and bias_pre is not None and is_cross:
            # hoisted-bias fallback (non-TPU / unfused shapes): [B,1,Skp]
            # padded additive rows -> the sdpa [B,1,1,Sk] layout
            mask_bias = bias_pre[:, :, None, : ctx.shape[1]]

        def _unpack_kv(a, sk):
            # hoisted K/V arrive row- and head-lane-padded; recover [B,sk,H,d]
            dp = a.shape[-1] // self.heads
            return a[:, :sk].reshape(b, sk, self.heads, dp)[..., :d].astype(self.dtype)

        q = _dense(x, wq, None, self.dtype).reshape(b, n, self.heads, d)
        if kv_pre is not None and is_cross:
            k = _unpack_kv(kv_pre[0], ctx.shape[1])
            v = _unpack_kv(kv_pre[1], ctx.shape[1])
        else:
            k = _dense(ctx, wk, None, self.dtype).reshape(b, -1, self.heads, d)
            v = _dense(ctx, wv, None, self.dtype).reshape(b, -1, self.heads, d)

        if self.use_adapter:
            # params always exist at adapter sites so the checkpoint layout is
            # stable; the branch contributes 0 when ip_scale == 0.
            wki, _ = DenseParams(inner, use_bias=False, name="to_k_ip")(ctx_dim)
            wvi, _ = DenseParams(inner, use_bias=False, name="to_v_ip")(ctx_dim)
            if ip_ctx is not None:
                if kv_pre is not None and kv_pre[2] is not None:
                    ki = _unpack_kv(kv_pre[2], ip_ctx.shape[1])
                    vi = _unpack_kv(kv_pre[3], ip_ctx.shape[1])
                else:
                    ki = _dense(ip_ctx, wki, None, self.dtype).reshape(b, -1, self.heads, d)
                    vi = _dense(ip_ctx, wvi, None, self.dtype).reshape(b, -1, self.heads, d)
                if self.use_pallas and not self.force_xla:
                    from ap_adapter_tpu.ops.pallas_attention import fused_dual_kv_attention

                    out = fused_dual_kv_attention(q, k, v, ki, vi, ip_scale)
                else:
                    out = sdpa(q, k, v, mask=mask_bias)
                    out = out + jnp.asarray(ip_scale, self.dtype) * sdpa(q, ki, vi)
            else:
                out = sdpa(q, k, v, mask=mask_bias)
        elif not is_cross and mask_bias is None:
            # self-attention: head-packed / whole-KV kernels for long seqs
            # (TPU); TP keeps the GSPMD-partitionable einsum form
            out = sdpa(q, k, v) if self.force_xla else self_attention(q, k, v)
        else:
            out = sdpa(q, k, v, mask=mask_bias)

        out = _dense(out.reshape(b, n, inner), wo, bo, self.dtype)
        return out if residual is None else residual + out


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers default): proj -> chunk -> x*gelu(g).

    With ``pre_ln`` (the preceding norm3 params) the module computes
    ``x + ff(LN(x))`` and routes to the fused Pallas kernel
    (ops/pallas_fused_ff.py) when the shape fits VMEM.
    """

    dim: int
    mult: int = 4
    use_int8: bool = False
    force_xla: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pre_ln: Optional[tuple] = None) -> jnp.ndarray:
        inner = self.dim * self.mult
        c_in = x.shape[-1]
        w1, b1 = DenseParams(inner * 2, name="geglu_proj")(c_in)
        w2, b2 = DenseParams(self.dim, name="out_proj")(inner)

        if pre_ln is not None and inner % 128 == 0 and c_in % 128 == 0 \
                and self.dim == c_in and _on_tpu() and not self.force_xla:
            if self.use_int8:
                # W8A8 serving mode (inference-only): both GEGLU matmuls in
                # int8 with dynamic per-row activation scales; weights
                # quantized once into the "quant" collection
                from ap_adapter_tpu.ops.pallas_int8 import (
                    ff_int8_tile_q, fused_ln_geglu_ff_int8, quantize_weight)

                if ff_int8_tile_q(x.shape[1], c_in, inner) > 0:
                    qw = self.variable(
                        "quant", "ff_qw",
                        lambda: (quantize_weight(jnp.asarray(w1, jnp.float32))
                                 + quantize_weight(jnp.asarray(w2, jnp.float32))))
                    w1q, s1, w2q, s2 = qw.value
                    scale, bias = pre_ln
                    return fused_ln_geglu_ff_int8(
                        x, scale, bias, w1q, s1,
                        jnp.asarray(b1, jnp.float32), w2q, s2,
                        jnp.asarray(b2, jnp.float32),
                        1e-5, ff_int8_tile_q(x.shape[1], c_in, inner),
                    )
            from ap_adapter_tpu.ops.pallas_fused_ff import ff_tile_q, fused_ln_geglu_ff_vjp

            if ff_tile_q(x.shape[1], c_in, inner) > 0:
                scale, bias = pre_ln
                return fused_ln_geglu_ff_vjp(
                    x, scale, bias,
                    jnp.asarray(w1, self.dtype), jnp.asarray(b1, self.dtype),
                    jnp.asarray(w2, self.dtype), jnp.asarray(b2, self.dtype),
                    1e-5,
                )

        residual = None
        if pre_ln is not None:
            residual = x
            x = layer_norm(x, pre_ln[0], pre_ln[1], dtype=self.dtype)
        y = _dense(x, w1, b1, self.dtype)
        y, gate = jnp.split(y, 2, axis=-1)
        y = y * nn.gelu(gate, approximate=False)
        out = _dense(y, w2, b2, self.dtype)
        return out if residual is None else residual + out


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn (or 2nd self if double_self), LN->GEGLU FF."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # None => double self-attention
    use_adapter: bool = False
    num_ip_tokens: int = 8
    use_pallas: bool = False
    use_int8: bool = False
    use_weight_prep: bool = False
    force_xla: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_mask_bias: Optional[jnp.ndarray] = None,
        ip_scale: jnp.ndarray | float = 0.0,
        kv_pre: Optional[tuple] = None,
        bias_pre: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # pre-LN params are passed INTO the attention (residual computed
        # there) so the hot self-attention sites fuse LN+QKV+attn+out+res
        # into one Pallas kernel (ops/pallas_fused_block.py)
        ln1 = LayerNormParams(self.dim, name="norm1")()
        x = CrossAttention(
            self.heads, self.dim_head, self.dim, use_int8=self.use_int8,
            use_weight_prep=self.use_weight_prep, force_xla=self.force_xla,
            dtype=self.dtype, name="attn1",
        )(x, pre_ln=ln1)

        ln2 = LayerNormParams(self.dim, name="norm2")()
        ctx = context if self.cross_attention_dim is not None else None
        x = CrossAttention(
            self.heads, self.dim_head, self.dim,
            use_adapter=self.use_adapter, num_ip_tokens=self.num_ip_tokens,
            use_pallas=self.use_pallas, use_int8=self.use_int8,
            use_weight_prep=self.use_weight_prep, force_xla=self.force_xla,
            dtype=self.dtype, name="attn2",
        )(x, context=ctx, mask_bias=context_mask_bias if ctx is not None else None,
          ip_scale=ip_scale, pre_ln=ln2,
          kv_pre=kv_pre if ctx is not None else None,
          bias_pre=bias_pre if ctx is not None else None)

        ln3 = LayerNormParams(self.dim, name="norm3")()
        return FeedForward(self.dim, use_int8=self.use_int8,
                           force_xla=self.force_xla, dtype=self.dtype,
                           name="ff")(x, pre_ln=ln3)


class _ScanTransformerBlock(BasicTransformerBlock):
    """BasicTransformerBlock with a scan-compatible (carry, out) return."""

    @nn.compact
    def __call__(self, x, context=None, context_mask_bias=None, ip_scale=0.0,
                 kv_pre=None, bias_pre=None):
        return (
            BasicTransformerBlock.__call__(self, x, context, context_mask_bias,
                                           ip_scale, kv_pre, bias_pre),
            None,
        )


class Transformer2DModel(nn.Module):
    """GN -> 1x1 proj_in -> transformer blocks over HW tokens -> proj_out + res.

    The (homogeneous) transformer blocks run under ``nn.scan`` with stacked
    [L, ...] parameters: the block body appears ONCE in the traced graph
    instead of L times — the graph dedup that keeps the full-scale fwd+bwd
    train step within the compile service's limits and halves inference
    cold-compile (checkpoint conversion stacks the per-block torch weights;
    convert/torch_import._transformer2d_params)."""

    heads: int
    dim_head: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    use_adapter: bool = False
    num_ip_tokens: int = 8
    use_pallas: bool = False
    use_int8: bool = False
    use_weight_prep: bool = False
    force_xla: bool = False
    groups: int = 32
    scan_unroll: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_mask_bias: Optional[jnp.ndarray] = None,
        ip_scale: jnp.ndarray | float = 0.0,
        kv_pre: Optional[tuple] = None,  # (k, v, ki, vi), each [L, B, Skp, cq]
        bias_pre: Optional[jnp.ndarray] = None,  # [B, 1, Skp] fp32
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm",
                         force_float32_reductions=_GN_F32_STATS)(x)
        y = nn.Dense(inner, dtype=self.dtype, name="proj_in")(y)  # 1x1 conv == dense
        y = y.reshape(b, h * w, inner)
        # hoisted K/V ride the scan sliced per block (axis 0 = L, matching
        # the stacked params they were projected with); everything else
        # broadcasts
        in_axes = (nn.broadcast, nn.broadcast, nn.broadcast,
                   nn.broadcast if kv_pre is None else 0, nn.broadcast)
        blocks = nn.scan(
            _ScanTransformerBlock,
            # "quant": per-block int8/prep weight copies (serving mode),
            # stacked [L, ...] exactly like the params they mirror
            variable_axes={"params": 0, "quant": 0},
            split_rngs={"params": True},
            in_axes=in_axes,
            length=self.num_layers,
            # unroll at trace time (params stay stacked): removes the
            # per-site loop overhead on the inference path; training keeps
            # unroll=1 for the compile-size dedup (UNetConfig.scan_unroll)
            unroll=min(self.scan_unroll, self.num_layers),
        )(
            inner, self.heads, self.dim_head,
            cross_attention_dim=self.cross_attention_dim,
            use_adapter=self.use_adapter, num_ip_tokens=self.num_ip_tokens,
            use_pallas=self.use_pallas, use_int8=self.use_int8,
            use_weight_prep=self.use_weight_prep, force_xla=self.force_xla,
            dtype=self.dtype, name="transformer_blocks",
        )
        y, _ = blocks(y, context, context_mask_bias, ip_scale, kv_pre, bias_pre)
        y = y.reshape(b, h, w, inner)
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return y + residual


class AttentionGroup(nn.Module):
    """One attention "layer" of the AudioLDM2 UNet: a list of
    Transformer2DModels, one per cross_attention_dims entry, routed
    idx<=1 -> stream0 (GPT-2+AudioMAE), idx>1 -> stream1 (T5)
    (reference modeling_audioldm2.py:1045-1059, 1140-1156)."""

    heads: int
    dim_head: int
    cross_attention_dims: Sequence[Optional[int]]
    transformer_layers: int
    adapter_dim: Optional[int] = None
    num_ip_tokens: int = 8
    use_pallas: bool = False
    use_int8: bool = False
    use_weight_prep: bool = False
    force_xla: bool = False
    groups: int = 32
    scan_unroll: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ehs0: Optional[jnp.ndarray],
        ehs1: Optional[jnp.ndarray],
        mask_bias0: Optional[jnp.ndarray] = None,
        mask_bias1: Optional[jnp.ndarray] = None,
        ip_scale: jnp.ndarray | float = 0.0,
        ctx_kv: Optional[dict] = None,  # this group's hoisted K/V (hoist.py)
        bias1_pre: Optional[jnp.ndarray] = None,  # [B, 1, Skp1] fp32
    ) -> jnp.ndarray:
        for idx, dim in enumerate(self.cross_attention_dims):
            if dim is not None and idx <= 1:
                context, bias, bias_pre = ehs0, mask_bias0, None
            elif dim is not None and idx > 1:
                context, bias, bias_pre = ehs1, mask_bias1, bias1_pre
            else:
                context, bias, bias_pre = None, None, None
            kv = ctx_kv.get(f"attentions_{idx}") if (
                ctx_kv is not None and dim is not None) else None
            x = Transformer2DModel(
                self.heads, self.dim_head,
                num_layers=self.transformer_layers,
                cross_attention_dim=dim,
                use_adapter=(dim is not None and dim == self.adapter_dim),
                num_ip_tokens=self.num_ip_tokens,
                use_pallas=self.use_pallas, use_int8=self.use_int8,
                use_weight_prep=self.use_weight_prep, force_xla=self.force_xla,
                groups=self.groups, scan_unroll=self.scan_unroll,
                dtype=self.dtype, name=f"attentions_{idx}",
            )(x, context, bias, ip_scale, kv, bias_pre)
        return x
