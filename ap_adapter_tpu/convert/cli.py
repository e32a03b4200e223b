"""Checkpoint conversion CLI: HF/diffusers AudioLDM2 directory -> msgpack params.

Converts a locally downloaded ``cvssp/audioldm2-large`` pipeline directory
(the reference loads it at inference.py:13) plus the AudioMAE ``pretrained.pth``
into this framework's parameter layout:

    python -m ap_adapter_tpu.convert.cli \
        --audioldm2-dir /path/to/audioldm2-large \
        --audiomae-ckpt /path/to/pretrained.pth \
        --adapter-ckpt /path/to/pytorch_model.bin \
        --out /path/to/converted

Reads each submodel's config.json to build the PipelineConfig (so base /
large / music variants all convert), maps weights via torch_import.py, and
writes <out>/<model>.msgpack + <out>/config.json. torch (CPU) is required.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ap_adapter_tpu import configs
from ap_adapter_tpu.convert import torch_import as ti


def _load_torch_weights(path_or_dir: str, *names: str) -> Dict[str, np.ndarray]:
    import torch

    candidates = []
    if os.path.isdir(path_or_dir):
        for n in names:
            candidates.append(os.path.join(path_or_dir, n))
    else:
        candidates.append(path_or_dir)
    for c in candidates:
        if os.path.exists(c):
            if c.endswith(".safetensors"):
                from safetensors.torch import load_file

                sd = load_file(c)
            else:
                sd = torch.load(c, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            if isinstance(sd, dict) and "model" in sd and all(
                hasattr(v, "numpy") for v in sd["model"].values()
            ):
                sd = sd["model"]
            return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weights found under {path_or_dir} ({names})")


def _json(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def build_config(audioldm2_dir: str) -> configs.PipelineConfig:
    """PipelineConfig from the diffusers pipeline's per-model config.json."""

    cfg = configs.PipelineConfig()

    ucfg = _json(os.path.join(audioldm2_dir, "unet", "config.json"))
    down = ucfg["down_block_types"]
    up = ucfg["up_block_types"]
    cross = tuple(ucfg["cross_attention_dim"]) if isinstance(
        ucfg["cross_attention_dim"], (list, tuple)
    ) else (ucfg["cross_attention_dim"],)
    unet = configs.UNetConfig(
        in_channels=ucfg["in_channels"],
        out_channels=ucfg["out_channels"],
        block_out_channels=tuple(ucfg["block_out_channels"]),
        down_block_has_attn=tuple(t == "CrossAttnDownBlock2D" for t in down),
        up_block_has_attn=tuple(t == "CrossAttnUpBlock2D" for t in up),
        layers_per_block=ucfg["layers_per_block"],
        transformer_layers_per_block=ucfg.get("transformer_layers_per_block", 1),
        cross_attention_dims=cross,
        num_attention_heads=(
            ucfg.get("num_attention_heads") or ucfg.get("attention_head_dim", 8)
        ),
        norm_num_groups=ucfg.get("norm_num_groups", 32),
        norm_eps=ucfg.get("norm_eps", 1e-5),
        flip_sin_to_cos=ucfg.get("flip_sin_to_cos", True),
        freq_shift=ucfg.get("freq_shift", 0),
        # the adapter targets the GPT-2/AudioMAE stream = cross dim index 1
        # (768 on every shipped AudioLDM2 variant; reference inference.py:16,37)
        adapter_cross_attention_dim=(
            cross[1] if len(cross) > 1 and cross[1] else 768
        ),
    )

    vcfg = _json(os.path.join(audioldm2_dir, "vae", "config.json"))
    vae = configs.VAEConfig(
        in_channels=vcfg["in_channels"],
        out_channels=vcfg["out_channels"],
        latent_channels=vcfg["latent_channels"],
        block_out_channels=tuple(vcfg["block_out_channels"]),
        layers_per_block=vcfg["layers_per_block"],
        norm_num_groups=vcfg.get("norm_num_groups", 32),
        scaling_factor=vcfg.get("scaling_factor", 0.18215),
        mid_block_attention=vcfg.get("mid_block_add_attention", True),
    )

    ocfg = _json(os.path.join(audioldm2_dir, "vocoder", "config.json"))
    voc = configs.VocoderConfig(
        model_in_dim=ocfg["model_in_dim"],
        sampling_rate=ocfg["sampling_rate"],
        upsample_initial_channel=ocfg["upsample_initial_channel"],
        upsample_rates=tuple(ocfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(ocfg["upsample_kernel_sizes"]),
        resblock_kernel_sizes=tuple(ocfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in ocfg["resblock_dilation_sizes"]),
        leaky_relu_slope=ocfg.get("leaky_relu_slope", 0.1),
        normalize_before=ocfg.get("normalize_before", False),
    )

    scfg = _json(os.path.join(audioldm2_dir, "scheduler", "scheduler_config.json"))
    sched = configs.SchedulerConfig(
        num_train_timesteps=scfg["num_train_timesteps"],
        beta_start=scfg["beta_start"],
        beta_end=scfg["beta_end"],
        beta_schedule=scfg["beta_schedule"],
        clip_sample=scfg.get("clip_sample", False),
        prediction_type=scfg.get("prediction_type", "epsilon"),
        set_alpha_to_one=scfg.get("set_alpha_to_one", False),
        steps_offset=scfg.get("steps_offset", 1),
        timestep_spacing=scfg.get("timestep_spacing", "leading"),
    )

    tcfg = _json(os.path.join(audioldm2_dir, "text_encoder", "config.json"))
    text_cfg = tcfg.get("text_config", tcfg)
    clap = configs.ClapTextConfig(
        vocab_size=text_cfg["vocab_size"],
        hidden_size=text_cfg["hidden_size"],
        num_layers=text_cfg["num_hidden_layers"],
        num_heads=text_cfg["num_attention_heads"],
        intermediate_size=text_cfg["intermediate_size"],
        max_position_embeddings=text_cfg["max_position_embeddings"],
        projection_dim=tcfg.get("projection_dim", text_cfg.get("projection_dim", 512)),
        pad_token_id=text_cfg.get("pad_token_id", 1),
    )

    t5cfg = _json(os.path.join(audioldm2_dir, "text_encoder_2", "config.json"))
    t5 = configs.T5Config(
        vocab_size=t5cfg["vocab_size"],
        d_model=t5cfg["d_model"],
        d_kv=t5cfg["d_kv"],
        d_ff=t5cfg["d_ff"],
        num_layers=t5cfg["num_layers"],
        num_heads=t5cfg["num_heads"],
        relative_attention_num_buckets=t5cfg["relative_attention_num_buckets"],
        relative_attention_max_distance=t5cfg.get("relative_attention_max_distance", 128),
        feed_forward_proj="gated-gelu" if t5cfg.get("is_gated_act") or "gated" in t5cfg.get("feed_forward_proj", "") else "relu",
    )

    gcfg = _json(os.path.join(audioldm2_dir, "language_model", "config.json"))
    gpt2 = configs.GPT2Config(
        vocab_size=gcfg["vocab_size"],
        n_embd=gcfg["n_embd"],
        n_layer=gcfg["n_layer"],
        n_head=gcfg["n_head"],
        n_positions=gcfg["n_positions"],
        max_new_tokens=gcfg.get("max_new_tokens", 8),
    )

    pcfg = _json(os.path.join(audioldm2_dir, "projection_model", "config.json"))
    proj = configs.ProjectionConfig(
        text_encoder_dim=pcfg["text_encoder_dim"],
        text_encoder_1_dim=pcfg["text_encoder_1_dim"],
        language_model_dim=pcfg["langauge_model_dim"],  # [sic] diffusers typo
    )

    return dataclasses.replace(
        cfg, unet=unet, vae=vae, vocoder=voc, scheduler=sched,
        clap=clap, t5=t5, gpt2=gpt2, projection=proj,
    )


WEIGHT_NAMES = ("diffusion_pytorch_model.bin", "diffusion_pytorch_model.safetensors",
                "pytorch_model.bin", "model.safetensors")


def convert(
    audioldm2_dir: str,
    out_dir: str,
    audiomae_ckpt: Optional[str] = None,
    adapter_ckpt: Optional[str] = None,
) -> configs.PipelineConfig:
    from ap_adapter_tpu.utils.checkpoint import save_params

    cfg = build_config(audioldm2_dir)
    params: Dict[str, Any] = {}

    sd = _load_torch_weights(os.path.join(audioldm2_dir, "unet"), *WEIGHT_NAMES)
    if adapter_ckpt:
        ad = _load_torch_weights(adapter_ckpt)
        sd = {**sd, **{k if ".processor." in k else k: v for k, v in ad.items()}}
    params["unet"] = ti.unet_params(sd, cfg.unet)

    params["vae"] = ti.vae_params(
        _load_torch_weights(os.path.join(audioldm2_dir, "vae"), *WEIGHT_NAMES), cfg.vae)
    params["vocoder"] = ti.vocoder_params(
        _load_torch_weights(os.path.join(audioldm2_dir, "vocoder"), *WEIGHT_NAMES), cfg.vocoder)
    params["clap"] = ti.clap_text_params(
        _load_torch_weights(os.path.join(audioldm2_dir, "text_encoder"), *WEIGHT_NAMES),
        num_layers=cfg.clap.num_layers)
    params["t5"] = ti.t5_encoder_params(
        _load_torch_weights(os.path.join(audioldm2_dir, "text_encoder_2"), *WEIGHT_NAMES),
        num_layers=cfg.t5.num_layers)
    params["gpt2"] = ti.gpt2_params(
        _load_torch_weights(os.path.join(audioldm2_dir, "language_model"), *WEIGHT_NAMES),
        num_layers=cfg.gpt2.n_layer)
    params["projection"] = ti.projection_params(
        _load_torch_weights(os.path.join(audioldm2_dir, "projection_model"), *WEIGHT_NAMES))

    if audiomae_ckpt:
        params["audiomae"] = ti.audiomae_condition_params(
            _load_torch_weights(audiomae_ckpt), depth=cfg.audiomae.depth)

    save_params(out_dir, params)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(
            dataclasses.replace(cfg, dtype=None)  # dtype isn't JSON-serializable
        ), f, indent=2, default=str)
    return cfg


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="convert AudioLDM2 torch checkpoints")
    p.add_argument("--audioldm2-dir", required=True)
    p.add_argument("--audiomae-ckpt", default=None)
    p.add_argument("--adapter-ckpt", default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    convert(args.audioldm2_dir, args.out, args.audiomae_ckpt, args.adapter_ckpt)
    print(f"converted -> {args.out}")


if __name__ == "__main__":
    main()
