"""End-to-end checkpoint conversion: a synthetic torch checkpoint directory
with the EXACT HF key inventory for all six models -> convert CLI -> msgpack
params -> load_pipeline -> generate.

CLAP / T5 / GPT-2 / HiFi-GAN state dicts come from REAL transformers model
instances (authentic key inventories); the diffusers models (UNet incl.
double_self_attention groups, VAE, projection) are synthesized from an
independent enumeration of the diffusers naming scheme (reference
pipeline/modeling_audioldm2.py module tree). A tracking dict asserts every
synthesized diffusers key is consumed, so any key-mapping drift in
convert/torch_import.py fails the test (VERDICT r1 item 5; reference load
path inference.py:13,51-59).
"""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# synthetic diffusers state dicts (independent key enumeration)
# ---------------------------------------------------------------------------


class SD(dict):
    """State dict builder: records every key read by the converter."""

    def __init__(self):
        super().__init__()
        self.used = set()
        self._rng = np.random.default_rng(0)

    def add(self, name, *shape):
        self[name] = (self._rng.standard_normal(shape) * 0.02).astype(np.float32)

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if k in self:
            self.used.add(k)
        return super().get(k, default)

    def unused(self):
        return sorted(set(self) - self.used)


CH = 32       # all tiny-UNet channels
TED = CH * 4  # time embed dim
CROSS = (None, 32, 48, None)
T_LAYERS = 1  # transformer_layers_per_block
LAYERS = 2    # layers_per_block


def _linear(sd, p, o, i, bias=True):
    sd.add(f"{p}.weight", o, i)
    if bias:
        sd.add(f"{p}.bias", o)


def _conv(sd, p, o, i, k=3):
    sd.add(f"{p}.weight", o, i, k, k)
    sd.add(f"{p}.bias", o)


def _norm(sd, p, n):
    sd.add(f"{p}.weight", n)
    sd.add(f"{p}.bias", n)


def _resnet(sd, p, in_ch, out_ch, temb=True):
    _norm(sd, f"{p}.norm1", in_ch)
    _conv(sd, f"{p}.conv1", out_ch, in_ch)
    if temb:
        _linear(sd, f"{p}.time_emb_proj", out_ch, TED)
    _norm(sd, f"{p}.norm2", out_ch)
    _conv(sd, f"{p}.conv2", out_ch, out_ch)
    if in_ch != out_ch:
        _conv(sd, f"{p}.conv_shortcut", out_ch, in_ch, k=1)


def _t2d(sd, p, cross_dim, adapter):
    """Transformer2DModel keys (diffusers); cross_dim None = double self."""

    _norm(sd, f"{p}.norm", CH)
    _conv(sd, f"{p}.proj_in", CH, CH, k=1)
    _conv(sd, f"{p}.proj_out", CH, CH, k=1)
    for t in range(T_LAYERS):
        tp = f"{p}.transformer_blocks.{t}"
        _norm(sd, f"{tp}.norm1", CH)
        for n in ("to_q", "to_k", "to_v"):
            _linear(sd, f"{tp}.attn1.{n}", CH, CH, bias=False)
        _linear(sd, f"{tp}.attn1.to_out.0", CH, CH)
        _norm(sd, f"{tp}.norm2", CH)
        kv_dim = cross_dim if cross_dim is not None else CH
        _linear(sd, f"{tp}.attn2.to_q", CH, CH, bias=False)
        _linear(sd, f"{tp}.attn2.to_k", CH, kv_dim, bias=False)
        _linear(sd, f"{tp}.attn2.to_v", CH, kv_dim, bias=False)
        _linear(sd, f"{tp}.attn2.to_out.0", CH, CH)
        if adapter:
            _linear(sd, f"{tp}.attn2.processor.to_k_ip", CH, kv_dim, bias=False)
            _linear(sd, f"{tp}.attn2.processor.to_v_ip", CH, kv_dim, bias=False)
        _norm(sd, f"{tp}.norm3", CH)
        _linear(sd, f"{tp}.ff.net.0.proj", CH * 8, CH)
        _linear(sd, f"{tp}.ff.net.2", CH, CH * 4)


def make_unet_sd():
    sd = SD()
    _conv(sd, "conv_in", CH, 8)
    _linear(sd, "time_embedding.linear_1", TED, CH)
    _linear(sd, "time_embedding.linear_2", TED, TED)

    def attn_layer(prefix, layer):
        for idx, dim in enumerate(CROSS):
            _t2d(sd, f"{prefix}.attentions.{layer * len(CROSS) + idx}",
                 dim, adapter=(dim == 32))

    for b in range(4):
        for l in range(LAYERS):
            _resnet(sd, f"down_blocks.{b}.resnets.{l}", CH, CH)
            if b >= 1:  # CrossAttnDownBlock2D at blocks 1..3
                attn_layer(f"down_blocks.{b}", l)
        if b < 3:
            _conv(sd, f"down_blocks.{b}.downsamplers.0.conv", CH, CH)

    _resnet(sd, "mid_block.resnets.0", CH, CH)
    _resnet(sd, "mid_block.resnets.1", CH, CH)
    attn_layer("mid_block", 0)

    for b in range(4):
        for l in range(LAYERS + 1):
            _resnet(sd, f"up_blocks.{b}.resnets.{l}", 2 * CH, CH)
            if b <= 2:  # CrossAttnUpBlock2D at blocks 0..2
                attn_layer(f"up_blocks.{b}", l)
        if b < 3:
            _conv(sd, f"up_blocks.{b}.upsamplers.0.conv", CH, CH)

    _norm(sd, "conv_norm_out", CH)
    _conv(sd, "conv_out", 8, CH)
    return sd


def make_vae_sd():
    sd = SD()
    vch, lat = 16, 8

    def mid(p):
        _resnet(sd, f"{p}.mid_block.resnets.0", vch, vch, temb=False)
        _resnet(sd, f"{p}.mid_block.resnets.1", vch, vch, temb=False)
        ap = f"{p}.mid_block.attentions.0"
        _norm(sd, f"{ap}.group_norm", vch)
        for n in ("to_q", "to_k", "to_v"):
            _linear(sd, f"{ap}.{n}", vch, vch)
        _linear(sd, f"{ap}.to_out.0", vch, vch)

    _conv(sd, "encoder.conv_in", vch, 1)
    for b in range(3):
        for l in range(2):
            _resnet(sd, f"encoder.down_blocks.{b}.resnets.{l}", vch, vch, temb=False)
        if b < 2:
            _conv(sd, f"encoder.down_blocks.{b}.downsamplers.0.conv", vch, vch)
    mid("encoder")
    _norm(sd, "encoder.conv_norm_out", vch)
    _conv(sd, "encoder.conv_out", 2 * lat, vch)

    _conv(sd, "decoder.conv_in", vch, lat)
    mid("decoder")
    for b in range(3):
        for l in range(3):
            _resnet(sd, f"decoder.up_blocks.{b}.resnets.{l}", vch, vch, temb=False)
        if b < 2:
            _conv(sd, f"decoder.up_blocks.{b}.upsamplers.0.conv", vch, vch)
    _norm(sd, "decoder.conv_norm_out", vch)
    _conv(sd, "decoder.conv_out", 1, vch)

    _conv(sd, "quant_conv", 2 * lat, 2 * lat, k=1)
    _conv(sd, "post_quant_conv", lat, lat, k=1)
    return sd


def make_projection_sd():
    sd = SD()
    _linear(sd, "projection", 32, 16)      # CLAP proj_dim -> GPT-2 n_embd
    _linear(sd, "projection_1", 32, 48)    # T5 d_model -> GPT-2 n_embd
    for n in ("sos_embed", "eos_embed", "sos_embed_1", "eos_embed_1"):
        sd.add(n, 32)
    return sd


# ---------------------------------------------------------------------------
# real transformers models for the HF-side inventories
# ---------------------------------------------------------------------------


def make_hf_state_dicts():
    from transformers import (
        ClapTextConfig, ClapTextModelWithProjection,
        GPT2Config, GPT2Model,
        SpeechT5HifiGan, SpeechT5HifiGanConfig,
        T5Config, T5EncoderModel,
    )

    torch.manual_seed(0)
    clap = ClapTextModelWithProjection(ClapTextConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, projection_dim=16))
    t5 = T5EncoderModel(T5Config(
        vocab_size=128, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu"))
    gpt2 = GPT2Model(GPT2Config(
        vocab_size=128, n_embd=32, n_layer=2, n_head=2, n_positions=128))
    voc = SpeechT5HifiGan(SpeechT5HifiGanConfig(
        model_in_dim=64, sampling_rate=16000, upsample_initial_channel=32,
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]]))
    return {
        "text_encoder": clap.state_dict(),
        "text_encoder_2": t5.state_dict(),
        "language_model": gpt2.state_dict(),
        "vocoder": voc.state_dict(),
    }


def write_checkpoint_dir(d):
    cfgs = {
        ("unet", "config.json"): {
            "in_channels": 8, "out_channels": 8,
            "block_out_channels": [CH] * 4,
            "down_block_types": ["DownBlock2D"] + ["CrossAttnDownBlock2D"] * 3,
            "up_block_types": ["CrossAttnUpBlock2D"] * 3 + ["UpBlock2D"],
            "layers_per_block": LAYERS, "transformer_layers_per_block": T_LAYERS,
            "cross_attention_dim": list(CROSS), "num_attention_heads": 2,
            "norm_num_groups": 8,
        },
        ("vae", "config.json"): {
            "in_channels": 1, "out_channels": 1, "latent_channels": 8,
            "block_out_channels": [16, 16, 16], "layers_per_block": 2,
            "norm_num_groups": 4, "scaling_factor": 0.9227,
        },
        ("vocoder", "config.json"): {
            "model_in_dim": 64, "sampling_rate": 16000,
            "upsample_initial_channel": 32,
            "upsample_rates": [4, 4], "upsample_kernel_sizes": [8, 8],
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        },
        ("scheduler", "scheduler_config.json"): {
            "num_train_timesteps": 1000, "beta_start": 0.0015,
            "beta_end": 0.0195, "beta_schedule": "scaled_linear",
        },
        ("text_encoder", "config.json"): {
            "projection_dim": 16,
            "text_config": {
                "vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
                "num_attention_heads": 2, "intermediate_size": 64,
                "max_position_embeddings": 64, "pad_token_id": 1,
            },
        },
        ("text_encoder_2", "config.json"): {
            "vocab_size": 128, "d_model": 48, "d_kv": 12, "d_ff": 96,
            "num_layers": 2, "num_heads": 4,
            "relative_attention_num_buckets": 32, "is_gated_act": True,
            "feed_forward_proj": "gated-gelu",
        },
        ("language_model", "config.json"): {
            "vocab_size": 128, "n_embd": 32, "n_layer": 2, "n_head": 2,
            "n_positions": 128, "max_new_tokens": 8,
        },
        ("projection_model", "config.json"): {
            "text_encoder_dim": 16, "text_encoder_1_dim": 48,
            "langauge_model_dim": 32,
        },
    }
    for (sub, name), obj in cfgs.items():
        os.makedirs(os.path.join(d, sub), exist_ok=True)
        with open(os.path.join(d, sub, name), "w") as f:
            json.dump(obj, f)

    synth = {"unet": make_unet_sd(), "vae": make_vae_sd(),
             "projection_model": make_projection_sd()}
    for sub, sd in synth.items():
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in dict(sd).items()},
                   os.path.join(d, sub, "diffusion_pytorch_model.bin"))
    for sub, sd in make_hf_state_dicts().items():
        torch.save(sd, os.path.join(d, sub, "pytorch_model.bin"))
    return synth


def test_convert_then_generate(tmp_path):
    from ap_adapter_tpu.convert import torch_import as ti
    from ap_adapter_tpu.convert.cli import convert
    from ap_adapter_tpu.pipeline.tasks import load_pipeline
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    src = str(tmp_path / "ckpt")
    out = str(tmp_path / "converted")
    synth = write_checkpoint_dir(src)

    cfg = convert(src, out)
    assert cfg.unet.adapter_cross_attention_dim == 32
    assert os.path.exists(os.path.join(out, "unet.msgpack"))
    assert os.path.exists(os.path.join(out, "config.json"))

    # every synthesized diffusers key must be consumed by the mapping —
    # a silently ignored key is exactly the "mapping drift" failure mode
    for name, maker, conv in [
        ("unet", make_unet_sd, lambda sd: ti.unet_params(sd, cfg.unet)),
        ("vae", make_vae_sd, lambda sd: ti.vae_params(sd, cfg.vae)),
        ("projection", make_projection_sd, lambda sd: ti.projection_params(sd)),
    ]:
        sd = maker()
        conv(sd)
        assert not sd.unused(), f"{name}: unconsumed keys {sd.unused()[:8]}"

    # converted params drive a full tiny generate (text-only, no AudioMAE —
    # the audio tower converts from a separate pretrained.pth, covered by
    # tests/test_audiomae.py)
    pipe = load_pipeline(cfg.replace(dtype=jnp.float32), checkpoint_dir=out)
    pos = make_text_batch(pipe.config, ["piano"], t5_len=8)
    neg = make_text_batch(pipe.config, [""], t5_len=8)
    wav = pipe.generate(pos, neg, None, audio_length_in_s=0.1,
                        num_inference_steps=2, seed=0)
    assert wav.shape[0] == 1 and wav.size > 0
    assert np.isfinite(wav).all()
