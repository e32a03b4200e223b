"""AudioLDM2 dual-stream conditional UNet in Flax (NHWC).

TPU-native re-design of ``AudioLDM2UNet2DConditionModel``
(reference pipeline/modeling_audioldm2.py:148-873): same topology — conv_in,
sinusoidal time embedding, down/mid/up blocks where every attention "layer"
is a group of 4 Transformer2DModels routed over two conditioning streams —
but built as a pure-functional Flax module whose decoupled audio-KV adapter
is part of the parameter tree (no mutable attention-processor registry).

Latent layout is NHWC: [batch, time, freq, channels] (e.g. [B, 250, 16, 8]
for a 10 s clip), the TPU-friendly layout for convolutions.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ap_adapter_tpu.configs import UNetConfig
from ap_adapter_tpu.models.layers import get_timestep_embedding
from ap_adapter_tpu.models.unet_blocks import (
    AttentionGroup,
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
)
from ap_adapter_tpu.ops.attention import mask_to_bias


class AudioLDM2UNet(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C_in]
        timesteps: jnp.ndarray,  # [B] or scalar
        encoder_hidden_states: jnp.ndarray,  # [B, S0, 768] GPT-2 + AudioMAE
        encoder_hidden_states_1: jnp.ndarray,  # [B, S1, 1024] T5 stream
        encoder_attention_mask_1: Optional[jnp.ndarray] = None,  # [B, S1]
        ip_scale: jnp.ndarray | float = 0.0,
        class_labels: Optional[jnp.ndarray] = None,  # [B, class_embed_dim]
        ctx_kv: Optional[dict] = None,  # hoisted cross K/V (models/hoist.py)
        temb_rows: Optional[dict] = None,  # {resnet: [C]} hoisted temb rows
    ) -> jnp.ndarray:
        c = self.config
        ch = c.block_out_channels
        heads = c.num_attention_heads
        groups = c.norm_num_groups

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # stream masks -> additive biases (reference modeling_audioldm2.py:741-747)
        bias0 = None  # the GPT-2+AudioMAE stream is never masked (all tokens real)
        bias1 = mask_to_bias(encoder_attention_mask_1, sample.shape[1]) if (
            encoder_attention_mask_1 is not None and ctx_kv is None
        ) else None
        bias1_pre = ctx_kv.get("__bias1__") if ctx_kv is not None else None

        # time embedding (hoisted out of the denoise scan when temb_rows is
        # given — the whole sin/cos -> MLP -> per-resnet Dense chain is
        # step-schedule-only, precomputed by models/hoist.precompute_temb_rows)
        temb = None
        if temb_rows is None:
            t_emb = get_timestep_embedding(
                timesteps, ch[0], flip_sin_to_cos=c.flip_sin_to_cos, downscale_freq_shift=c.freq_shift
            ).astype(self.dtype)
            temb = nn.Dense(c.time_embed_dim, dtype=self.dtype, name="time_embedding_linear_1")(t_emb)
            temb = nn.silu(temb)
            temb = nn.Dense(c.time_embed_dim, dtype=self.dtype, name="time_embedding_linear_2")(temb)

        if c.class_embed_dim is not None and class_labels is not None:
            # class-conditioned path (AudioLDM v1) — not wired for temb
            # hoisting (precompute_temb_rows does not fold cemb in), so
            # refuse the combination loudly instead of dropping conditioning
            if temb is None:
                raise ValueError(
                    "class_labels conditioning is incompatible with hoisted "
                    "temb_rows: the precomputed rows do not include the class "
                    "embedding. Pass temb_rows=None for class-conditioned runs."
                )
            # "simple_projection" class embedding (AudioLDM v1:
            # modeling path class_embed_type='simple_projection')
            cemb = nn.Dense(c.time_embed_dim, dtype=self.dtype, name="class_embedding")(
                class_labels.astype(self.dtype)
            )
            if c.class_embeddings_concat:
                temb = jnp.concatenate([temb, cemb], axis=-1)
            else:
                temb = temb + cemb

        ehs0 = encoder_hidden_states.astype(self.dtype)
        ehs1 = encoder_hidden_states_1.astype(self.dtype)
        if c.cn_text_only and ehs0.shape[1] > c.adapter_num_tokens:
            # ControlNet-branch semantics (reference CNAttnProcessor2_0,
            # attention_processor.py:585-586): keep only the leading text
            # tokens; the adapter branch below is also disabled
            ehs0 = ehs0[:, : c.adapter_num_tokens]

        # under remat, every resnet / attention group recomputes its forward
        # during the backward pass: activation memory and the bwd graph both
        # shrink by the block count (jax.checkpoint via nn.remat — the
        # TPU-native analogue of the reference's enable_gradient_checkpointing,
        # modeling_audioldm2.py:1099-1137)
        AttnGroup = nn.remat(AttentionGroup) if c.remat else AttentionGroup
        Resnet = nn.remat(ResnetBlock2D) if c.remat else ResnetBlock2D

        def attn_group(block_ch, name):
            return AttnGroup(
                heads=heads,
                dim_head=block_ch // heads,
                cross_attention_dims=c.cross_attention_dims,
                transformer_layers=c.transformer_layers_per_block,
                adapter_dim=None if c.cn_text_only else c.adapter_cross_attention_dim,
                num_ip_tokens=c.adapter_num_tokens,
                use_pallas=c.use_pallas_attention,
                use_int8=c.use_int8,
                use_weight_prep=c.use_weight_prep,
                force_xla=c.force_xla_core,
                groups=groups,
                scan_unroll=c.scan_unroll,
                dtype=self.dtype,
                name=name,
            )

        def kv_of(name):
            return ctx_kv.get(name) if ctx_kv is not None else None

        def trow(name):
            return temb_rows.get(name) if temb_rows is not None else None

        x = nn.Conv(ch[0], (c.conv_in_kernel,) * 2, padding=(c.conv_in_kernel - 1) // 2,
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        # ----- down -----
        skips = [x]
        num_blocks = len(ch)
        for bi in range(num_blocks):
            out_ch = ch[bi]
            for li in range(c.layers_per_block):
                x = Resnet(out_ch, groups, c.norm_eps, use_pallas_gn=c.use_pallas_groupnorm, use_pallas_resnet=c.use_pallas_resnet,
                           dtype=self.dtype, name=f"down_{bi}_resnet_{li}")(
                               x, temb, trow(f"down_{bi}_resnet_{li}"))
                if c.down_block_has_attn[bi]:
                    x = attn_group(out_ch, f"down_{bi}_attn_{li}")(
                        x, ehs0, ehs1, bias0, bias1, ip_scale,
                        kv_of(f"down_{bi}_attn_{li}"), bias1_pre
                    )
                skips.append(x)
            if bi < num_blocks - 1:
                x = Downsample2D(out_ch, c.downsample_padding, dtype=self.dtype,
                                 name=f"down_{bi}_downsample")(x)
                skips.append(x)

        # ----- mid -----
        x = Resnet(ch[-1], groups, c.norm_eps, use_pallas_gn=c.use_pallas_groupnorm, use_pallas_resnet=c.use_pallas_resnet,
                   dtype=self.dtype, name="mid_resnet_0")(x, temb, trow("mid_resnet_0"))
        x = attn_group(ch[-1], "mid_attn_0")(
            x, ehs0, ehs1, bias0, bias1, ip_scale, kv_of("mid_attn_0"), bias1_pre)
        x = Resnet(ch[-1], groups, c.norm_eps, use_pallas_gn=c.use_pallas_groupnorm, use_pallas_resnet=c.use_pallas_resnet,
                   dtype=self.dtype, name="mid_resnet_1")(x, temb, trow("mid_resnet_1"))

        # ----- up -----
        reversed_ch = list(reversed(ch))
        for bi in range(num_blocks):
            out_ch = reversed_ch[bi]
            is_final = bi == num_blocks - 1
            for li in range(c.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = Resnet(out_ch, groups, c.norm_eps, use_pallas_gn=c.use_pallas_groupnorm, use_pallas_resnet=c.use_pallas_resnet,
                           dtype=self.dtype, name=f"up_{bi}_resnet_{li}")(
                               x, temb, trow(f"up_{bi}_resnet_{li}"))
                if c.up_block_has_attn[bi]:
                    x = attn_group(out_ch, f"up_{bi}_attn_{li}")(
                        x, ehs0, ehs1, bias0, bias1, ip_scale,
                        kv_of(f"up_{bi}_attn_{li}"), bias1_pre
                    )
            if not is_final:
                # upsample to the next skip's spatial dims (handles odd sizes
                # the same way diffusers' forward_upsample_size does)
                target = skips[-1].shape[1:3]
                x = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{bi}_upsample")(x, target)

        from ap_adapter_tpu.models.unet_blocks import _GN_F32_STATS

        x = nn.GroupNorm(num_groups=groups, epsilon=c.norm_eps, dtype=self.dtype,
                         name="conv_norm_out",
                         force_float32_reductions=_GN_F32_STATS)(x)
        x = nn.silu(x)
        x = nn.Conv(c.out_channels, (c.conv_out_kernel,) * 2, padding=(c.conv_out_kernel - 1) // 2,
                    dtype=self.dtype, name="conv_out")(x)
        return x
