"""PyTorch checkpoint -> Flax param pytree conversion.

All converters take a flat ``{name: numpy array}`` state dict (call
``{k: v.detach().cpu().numpy() for k, v in sd.items()}`` on a torch state
dict first — this module itself has no torch dependency) and return nested
Flax param dicts matching the modules in ap_adapter_tpu.models.

Conventions:
  * torch ``nn.Linear.weight`` [out, in]  -> Dense ``kernel`` [in, out]
  * torch ``nn.Conv2d.weight`` [O,I,H,W]  -> Conv ``kernel`` [H,W,I,O]
  * torch ``nn.Conv1d.weight`` [O,I,W]    -> Conv ``kernel`` [W,I,O]
  * torch ``nn.ConvTranspose1d.weight`` [I,O,W] -> ConvTranspose ``kernel`` [W,I,O]
  * norms: weight -> scale, bias -> bias
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def t_linear(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def t_conv2d(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def t_conv1d(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 1, 0))}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def t_conv_transpose1d(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    # torch [in, out, W] -> flax ConvTranspose [W, in, out]
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 0, 1))}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def t_norm(sd: StateDict, prefix: str) -> Dict:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def t_rmsnorm(sd: StateDict, prefix: str) -> Dict:
    return {"scale": sd[prefix + ".weight"]}


# ---------------------------------------------------------------------------
# AudioMAE (checkpoint 'pretrained.pth' ['model'] — reference AudioMAE.py:28-30)
# ---------------------------------------------------------------------------


def audiomae_encoder_params(sd: StateDict, depth: int = 12) -> Dict:
    """Map the MAE ViT encoder weights (decoder keys are ignored)."""

    params = {
        "patch_embed": t_conv2d(sd, "patch_embed.proj"),
        "cls_token": sd["cls_token"],
        "norm": t_norm(sd, "norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": t_norm(sd, f"{p}.norm1"),
            "attn": {
                "qkv": t_linear(sd, f"{p}.attn.qkv"),
                "proj": t_linear(sd, f"{p}.attn.proj"),
            },
            "norm2": t_norm(sd, f"{p}.norm2"),
            "fc1": t_linear(sd, f"{p}.mlp.fc1"),
            "fc2": t_linear(sd, f"{p}.mlp.fc2"),
        }
    return params


def audiomae_pretrain_params(
    sd: StateDict, depth: int = 12, decoder_depth: int = 8
) -> Dict:
    """Map a full MAE checkpoint (encoder + decoder) for models.mae_pretrain.

    Decoder key names follow the reference's module attributes
    (models_mae.py:236-301): ``decoder_embed``, ``mask_token``,
    ``decoder_blocks.{i}`` (plain timm Block, decoder_mode=0),
    ``decoder_norm``, ``decoder_pred``.
    """

    dec: Dict = {
        "decoder_embed": t_linear(sd, "decoder_embed"),
        "mask_token": sd["mask_token"],
        "decoder_norm": t_norm(sd, "decoder_norm"),
        "decoder_pred": t_linear(sd, "decoder_pred"),
    }
    for i in range(decoder_depth):
        p = f"decoder_blocks.{i}"
        dec[f"block_{i}"] = {
            "norm1": t_norm(sd, f"{p}.norm1"),
            "attn": {
                "qkv": t_linear(sd, f"{p}.attn.qkv"),
                "proj": t_linear(sd, f"{p}.attn.proj"),
            },
            "norm2": t_norm(sd, f"{p}.norm2"),
            "fc1": t_linear(sd, f"{p}.mlp.fc1"),
            "fc2": t_linear(sd, f"{p}.mlp.fc2"),
        }
    return {"audiomae": audiomae_encoder_params(sd, depth), "decoder": dec}


def audiomae_condition_params(sd: StateDict, depth: int = 12) -> Dict:
    """Params for AudioMAECondition; accepts either bare-MAE or the
    reference's nested ``audiomae.model.`` prefixes."""

    for prefix in ("audiomae.model.", "model.", ""):
        if any(k.startswith(prefix + "cls_token") for k in sd):
            stripped = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            return {"audiomae": audiomae_encoder_params(stripped, depth)}
    raise KeyError("no AudioMAE weights found in state dict")


# ---------------------------------------------------------------------------
# CLAP text branch (HF ClapModel 'text_model.*' + 'text_projection.*')
# ---------------------------------------------------------------------------


def clap_text_params(sd: StateDict, num_layers: int = 12) -> Dict:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    params = {
        "word_embeddings": {"embedding": sd[pre + "embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd[pre + "embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd[pre + "embeddings.token_type_embeddings.weight"]},
        "embeddings_norm": t_norm(sd, pre + "embeddings.LayerNorm"),
        "pooler": t_linear(sd, pre + "pooler.dense"),
        "projection_1": t_linear(sd, "text_projection.linear1"),
        "projection_2": t_linear(sd, "text_projection.linear2"),
    }
    for i in range(num_layers):
        p = f"{pre}encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "self": {
                "query": t_linear(sd, f"{p}.attention.self.query"),
                "key": t_linear(sd, f"{p}.attention.self.key"),
                "value": t_linear(sd, f"{p}.attention.self.value"),
            },
            "attn_out": t_linear(sd, f"{p}.attention.output.dense"),
            "attn_norm": t_norm(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": t_linear(sd, f"{p}.intermediate.dense"),
            "output": t_linear(sd, f"{p}.output.dense"),
            "out_norm": t_norm(sd, f"{p}.output.LayerNorm"),
        }
    return params


# ---------------------------------------------------------------------------
# T5 encoder (HF T5EncoderModel)
# ---------------------------------------------------------------------------


def t5_encoder_params(sd: StateDict, num_layers: int = 24) -> Dict:
    params = {
        "shared": {"embedding": sd["shared.weight"]},
        "final_norm": t_rmsnorm(sd, "encoder.final_layer_norm"),
    }
    for i in range(num_layers):
        p = f"encoder.block.{i}"
        blk = {
            "attn_norm": t_rmsnorm(sd, f"{p}.layer.0.layer_norm"),
            "attention": {
                "q": t_linear(sd, f"{p}.layer.0.SelfAttention.q", bias=False),
                "k": t_linear(sd, f"{p}.layer.0.SelfAttention.k", bias=False),
                "v": t_linear(sd, f"{p}.layer.0.SelfAttention.v", bias=False),
                "o": t_linear(sd, f"{p}.layer.0.SelfAttention.o", bias=False),
            },
            "ff_norm": t_rmsnorm(sd, f"{p}.layer.1.layer_norm"),
        }
        if f"{p}.layer.1.DenseReluDense.wi_0.weight" in sd:
            blk["wi_0"] = t_linear(sd, f"{p}.layer.1.DenseReluDense.wi_0", bias=False)
            blk["wi_1"] = t_linear(sd, f"{p}.layer.1.DenseReluDense.wi_1", bias=False)
        else:
            blk["wi"] = t_linear(sd, f"{p}.layer.1.DenseReluDense.wi", bias=False)
        blk["wo"] = t_linear(sd, f"{p}.layer.1.DenseReluDense.wo", bias=False)
        if i == 0:
            blk["attention"]["relative_attention_bias"] = sd[
                f"{p}.layer.0.SelfAttention.relative_attention_bias.weight"
            ]
        params[f"block_{i}"] = blk
    return params


# ---------------------------------------------------------------------------
# GPT-2 (HF GPT2Model; Conv1D weights are already [in, out] — no transpose)
# ---------------------------------------------------------------------------


def _t_conv1d_linear(sd: StateDict, prefix: str) -> Dict:
    return {"kernel": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def gpt2_params(sd: StateDict, num_layers: int = 12) -> Dict:
    params = {
        "wpe": {"embedding": sd["wpe.weight"]},
        "ln_f": t_norm(sd, "ln_f"),
    }
    for i in range(num_layers):
        p = f"h.{i}"
        params[f"h_{i}"] = {
            "ln_1": t_norm(sd, f"{p}.ln_1"),
            "attn": {
                "c_attn": _t_conv1d_linear(sd, f"{p}.attn.c_attn"),
                "c_proj": _t_conv1d_linear(sd, f"{p}.attn.c_proj"),
            },
            "ln_2": t_norm(sd, f"{p}.ln_2"),
            "c_fc": _t_conv1d_linear(sd, f"{p}.mlp.c_fc"),
            "c_proj": _t_conv1d_linear(sd, f"{p}.mlp.c_proj"),
        }
    return params


# ---------------------------------------------------------------------------
# AudioLDM2 projection model (diffusers AudioLDM2ProjectionModel)
# ---------------------------------------------------------------------------


def projection_params(sd: StateDict) -> Dict:
    return {
        "projection": t_linear(sd, "projection"),
        "projection_1": t_linear(sd, "projection_1"),
        "sos_embed": sd["sos_embed"],
        "eos_embed": sd["eos_embed"],
        "sos_embed_1": sd["sos_embed_1"],
        "eos_embed_1": sd["eos_embed_1"],
    }


# ---------------------------------------------------------------------------
# Transformer2DModel / attention-group helpers (AudioLDM2 UNet)
# ---------------------------------------------------------------------------


def _t_conv1x1_dense(sd: StateDict, prefix: str) -> Dict:
    """torch Conv2d 1x1 [O,I,1,1] -> Dense kernel [I,O]."""

    w = sd[prefix + ".weight"]
    out = {"kernel": np.ascontiguousarray(w[:, :, 0, 0].T)}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _attention_params(sd: StateDict, p: str, has_adapter: bool) -> Dict:
    out = {
        "to_q": t_linear(sd, f"{p}.to_q", bias=False),
        "to_k": t_linear(sd, f"{p}.to_k", bias=False),
        "to_v": t_linear(sd, f"{p}.to_v", bias=False),
        "to_out": t_linear(sd, f"{p}.to_out.0"),
    }
    if has_adapter:
        if f"{p}.processor.to_k_ip.weight" in sd:
            out["to_k_ip"] = t_linear(sd, f"{p}.processor.to_k_ip", bias=False)
            out["to_v_ip"] = t_linear(sd, f"{p}.processor.to_v_ip", bias=False)
        else:
            # zero-delta init: copy the frozen text K/V (reference copy_weight.py)
            out["to_k_ip"] = {"kernel": out["to_k"]["kernel"].copy()}
            out["to_v_ip"] = {"kernel": out["to_v"]["kernel"].copy()}
    return out


def _stack_trees(trees):
    """[{...}, {...}] -> {...} with leaves stacked along a new axis 0
    (the nn.scan stacked-parameter layout of Transformer2DModel)."""

    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def _transformer2d_params(sd: StateDict, p: str, num_layers: int, has_adapter: bool) -> Dict:
    params = {
        "norm": t_norm(sd, f"{p}.norm"),
        "proj_in": _t_conv1x1_dense(sd, f"{p}.proj_in"),
        "proj_out": _t_conv1x1_dense(sd, f"{p}.proj_out"),
    }
    blocks = []
    for t in range(num_layers):
        tp = f"{p}.transformer_blocks.{t}"
        blocks.append({
            "norm1": t_norm(sd, f"{tp}.norm1"),
            "attn1": _attention_params(sd, f"{tp}.attn1", False),
            "norm2": t_norm(sd, f"{tp}.norm2"),
            "attn2": _attention_params(sd, f"{tp}.attn2", has_adapter),
            "norm3": t_norm(sd, f"{tp}.norm3"),
            "ff": {
                "geglu_proj": t_linear(sd, f"{tp}.ff.net.0.proj"),
                "out_proj": t_linear(sd, f"{tp}.ff.net.2"),
            },
        })
    params["transformer_blocks"] = _stack_trees(blocks)
    return params


def _resnet_params(sd: StateDict, p: str, use_temb: bool = True) -> Dict:
    params = {
        "norm1": t_norm(sd, f"{p}.norm1"),
        "conv1": t_conv2d(sd, f"{p}.conv1"),
        "norm2": t_norm(sd, f"{p}.norm2"),
        "conv2": t_conv2d(sd, f"{p}.conv2"),
    }
    if use_temb and f"{p}.time_emb_proj.weight" in sd:
        params["time_emb_proj"] = t_linear(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        params["conv_shortcut"] = t_conv2d(sd, f"{p}.conv_shortcut")
    return params


def unet_params(sd: StateDict, config) -> Dict:
    """Map AudioLDM2UNet2DConditionModel weights to the Flax AudioLDM2UNet.

    ``config`` is an ap_adapter_tpu UNetConfig (for topology). The torch flat
    attention index is layer*len(cross_dims)+idx; ours is nested per layer.
    """

    n_dims = len(config.cross_attention_dims)
    t_layers = config.transformer_layers_per_block
    adapter_dim = config.adapter_cross_attention_dim

    params = {
        "conv_in": t_conv2d(sd, "conv_in"),
        "time_embedding_linear_1": t_linear(sd, "time_embedding.linear_1"),
        "time_embedding_linear_2": t_linear(sd, "time_embedding.linear_2"),
        "conv_norm_out": t_norm(sd, "conv_norm_out"),
        "conv_out": t_conv2d(sd, "conv_out"),
    }

    def attn_group(tprefix, fprefix, layer):
        for idx, dim in enumerate(config.cross_attention_dims):
            flat = layer * n_dims + idx
            params.setdefault(fprefix, {})[f"attentions_{idx}"] = _transformer2d_params(
                sd, f"{tprefix}.attentions.{flat}", t_layers,
                has_adapter=(dim is not None and dim == adapter_dim),
            )

    num_blocks = len(config.block_out_channels)
    for b in range(num_blocks):
        for l in range(config.layers_per_block):
            params[f"down_{b}_resnet_{l}"] = _resnet_params(sd, f"down_blocks.{b}.resnets.{l}")
            if config.down_block_has_attn[b]:
                attn_group(f"down_blocks.{b}", f"down_{b}_attn_{l}", l)
        if b < num_blocks - 1:
            params[f"down_{b}_downsample"] = {
                "conv": t_conv2d(sd, f"down_blocks.{b}.downsamplers.0.conv")
            }

    params["mid_resnet_0"] = _resnet_params(sd, "mid_block.resnets.0")
    params["mid_resnet_1"] = _resnet_params(sd, "mid_block.resnets.1")
    attn_group("mid_block", "mid_attn_0", 0)

    for b in range(num_blocks):
        for l in range(config.layers_per_block + 1):
            params[f"up_{b}_resnet_{l}"] = _resnet_params(sd, f"up_blocks.{b}.resnets.{l}")
            if config.up_block_has_attn[b]:
                attn_group(f"up_blocks.{b}", f"up_{b}_attn_{l}", l)
        if b < num_blocks - 1:
            params[f"up_{b}_upsample"] = {"conv": t_conv2d(sd, f"up_blocks.{b}.upsamplers.0.conv")}

    return params


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL)
# ---------------------------------------------------------------------------


def _vae_mid(sd: StateDict, p: str) -> Dict:
    out = {
        "mid_resnet_0": _resnet_params(sd, f"{p}.mid_block.resnets.0", use_temb=False),
        "mid_resnet_1": _resnet_params(sd, f"{p}.mid_block.resnets.1", use_temb=False),
    }
    ap = f"{p}.mid_block.attentions.0"
    if f"{ap}.to_q.weight" in sd:
        out["mid_attn"] = {
            "group_norm": t_norm(sd, f"{ap}.group_norm"),
            "to_q": t_linear(sd, f"{ap}.to_q"),
            "to_k": t_linear(sd, f"{ap}.to_k"),
            "to_v": t_linear(sd, f"{ap}.to_v"),
            "to_out": t_linear(sd, f"{ap}.to_out.0"),
        }
    return out


def vae_params(sd: StateDict, config) -> Dict:
    n = len(config.block_out_channels)
    enc: Dict = {"conv_in": t_conv2d(sd, "encoder.conv_in"),
                 "conv_norm_out": t_norm(sd, "encoder.conv_norm_out"),
                 "conv_out": t_conv2d(sd, "encoder.conv_out")}
    enc.update(_vae_mid(sd, "encoder"))
    for b in range(n):
        for l in range(config.layers_per_block):
            enc[f"down_{b}_resnet_{l}"] = _resnet_params(
                sd, f"encoder.down_blocks.{b}.resnets.{l}", use_temb=False)
        if b < n - 1:
            enc[f"down_{b}_downsample"] = {
                "conv": t_conv2d(sd, f"encoder.down_blocks.{b}.downsamplers.0.conv")}

    dec: Dict = {"conv_in": t_conv2d(sd, "decoder.conv_in"),
                 "conv_norm_out": t_norm(sd, "decoder.conv_norm_out"),
                 "conv_out": t_conv2d(sd, "decoder.conv_out")}
    dec.update(_vae_mid(sd, "decoder"))
    for b in range(n):
        for l in range(config.layers_per_block + 1):
            dec[f"up_{b}_resnet_{l}"] = _resnet_params(
                sd, f"decoder.up_blocks.{b}.resnets.{l}", use_temb=False)
        if b < n - 1:
            dec[f"up_{b}_upsample"] = {
                "conv": t_conv2d(sd, f"decoder.up_blocks.{b}.upsamplers.0.conv")}

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _t_conv1x1_dense(sd, "quant_conv"),
        "post_quant_conv": _t_conv1x1_dense(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# HiFi-GAN vocoder (transformers SpeechT5HifiGan)
# ---------------------------------------------------------------------------


def vocoder_params(sd: StateDict, config) -> Dict:
    params: Dict = {
        "conv_pre": t_conv1d(sd, "conv_pre"),
        "conv_post": t_conv1d(sd, "conv_post"),
    }
    if config.normalize_before or "mean" in sd:
        params["mean"] = sd.get("mean")
        params["scale"] = sd.get("scale")
        if params["mean"] is None:
            params.pop("mean"), params.pop("scale")
    num_kernels = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        params[f"upsampler_{i}"] = t_conv_transpose1d(sd, f"upsampler.{i}")
        for j in range(num_kernels):
            flat = i * num_kernels + j
            rb: Dict = {}
            for m in range(len(config.resblock_dilation_sizes[j])):
                rb[f"convs1_{m}"] = t_conv1d(sd, f"resblocks.{flat}.convs1.{m}")
                rb[f"convs2_{m}"] = t_conv1d(sd, f"resblocks.{flat}.convs2.{m}")
            params[f"resblock_{i}_{j}"] = rb
    return params


# ---------------------------------------------------------------------------
# CLAP audio tower (HF ClapAudioModel[-WithProjection] / ClapModel audio side)
# ---------------------------------------------------------------------------


def clap_audio_params(sd: StateDict, config) -> Dict:
    """Map HF CLAP audio-encoder + projection weights to ClapAudioTower."""

    pre = ""
    for cand in ("audio_model.audio_encoder.", "audio_encoder."):
        if any(k.startswith(cand) for k in sd):
            pre = cand
            break

    enc: Dict = {
        "bn_scale": sd[pre + "batch_norm.weight"],
        "bn_bias": sd[pre + "batch_norm.bias"],
        "bn_mean": sd[pre + "batch_norm.running_mean"],
        "bn_var": sd[pre + "batch_norm.running_var"],
        "patch_proj": t_conv2d(sd, pre + "patch_embed.proj"),
        "patch_norm": t_norm(sd, pre + "patch_embed.norm"),
        "norm": t_norm(sd, pre + "norm"),
    }
    for si, depth in enumerate(config.depths):
        for bi in range(depth):
            p = f"{pre}layers.{si}.blocks.{bi}"
            enc[f"stage_{si}_block_{bi}"] = {
                "layernorm_before": t_norm(sd, f"{p}.layernorm_before"),
                "attention": {
                    "query": t_linear(sd, f"{p}.attention.self.query"),
                    "key": t_linear(sd, f"{p}.attention.self.key"),
                    "value": t_linear(sd, f"{p}.attention.self.value"),
                    "relative_position_bias_table": sd[
                        f"{p}.attention.self.relative_position_bias_table"
                    ],
                    "output": t_linear(sd, f"{p}.attention.output.dense"),
                },
                "layernorm_after": t_norm(sd, f"{p}.layernorm_after"),
                "intermediate": t_linear(sd, f"{p}.intermediate.dense"),
                "mlp_output": t_linear(sd, f"{p}.output.dense"),
            }
        if si < len(config.depths) - 1:
            p = f"{pre}layers.{si}.downsample"
            enc[f"stage_{si}_downsample"] = {
                "norm": t_norm(sd, f"{p}.norm"),
                "reduction": t_linear(sd, f"{p}.reduction", bias=False),
            }

    return {
        "encoder": enc,
        "projection_1": t_linear(sd, "audio_projection.linear1"),
        "projection_2": t_linear(sd, "audio_projection.linear2"),
    }


# ---------------------------------------------------------------------------
# VGGish (torchvggish / frechet-audio-distance embedder — reference
# requirements.txt; eval/vggish.py has the architecture + front-end)
# ---------------------------------------------------------------------------


def vggish_params(sd: StateDict) -> Dict:
    """Map torchvggish state-dict keys (features.N / embeddings.N) to
    eval/vggish.VGGish. The pre-MLP flatten is NHWC on both sides
    (torchvggish permutes to NHWC before .view), so fc weights map 1:1."""

    convs = {"conv1": 0, "conv2": 3, "conv3_1": 6, "conv3_2": 8,
             "conv4_1": 11, "conv4_2": 13}
    params: Dict = {
        name: t_conv2d(sd, f"features.{idx}") for name, idx in convs.items()
    }
    for name, idx in (("fc1", 0), ("fc2", 2), ("fc_embed", 4)):
        params[name] = t_linear(sd, f"embeddings.{idx}")
    return params
