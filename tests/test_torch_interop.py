"""torch-checkpoint interop: flat adapter .bin round trip + convert CLI config
parsing from a synthetic diffusers-style checkpoint directory."""

import json
import os

import numpy as np
import torch

from ap_adapter_tpu.adapter.params import export_flat_adapter, import_flat_adapter
from ap_adapter_tpu.pipeline.tasks import _load_flat_adapter
from tests.test_unet import TINY, tiny_unet  # noqa: F401


def test_torch_bin_adapter_roundtrip(tmp_path, tiny_unet):  # noqa: F811
    """A reference-format pytorch_model.bin loads into our UNet params."""

    _, params = tiny_unet
    flat = export_flat_adapter(params, TINY)
    sd = {k: torch.from_numpy(np.asarray(v) + 1.5) for k, v in flat.items()}
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(sd, path)

    loaded = _load_flat_adapter(path)
    assert set(loaded) == set(flat)
    params2 = import_flat_adapter(params, loaded, TINY)
    flat2 = export_flat_adapter(params2, TINY)
    for k in flat:
        np.testing.assert_allclose(flat2[k], flat[k] + 1.5, rtol=1e-6)


def test_convert_cli_build_config(tmp_path):
    """build_config reads diffusers-layout config.json files."""

    from ap_adapter_tpu.convert.cli import build_config

    d = tmp_path
    def w(sub, name, obj):
        os.makedirs(d / sub, exist_ok=True)
        with open(d / sub / name, "w") as f:
            json.dump(obj, f)

    w("unet", "config.json", {
        "in_channels": 8, "out_channels": 8,
        "block_out_channels": [128, 256, 384, 640],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"],
        "up_block_types": ["CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                           "CrossAttnUpBlock2D", "UpBlock2D"],
        "layers_per_block": 2, "transformer_layers_per_block": 2,
        "cross_attention_dim": [None, 768, 1024, None],
        "attention_head_dim": 8,
    })
    w("vae", "config.json", {
        "in_channels": 1, "out_channels": 1, "latent_channels": 8,
        "block_out_channels": [128, 256, 512], "layers_per_block": 2,
        "scaling_factor": 0.9227,
    })
    w("vocoder", "config.json", {
        "model_in_dim": 64, "sampling_rate": 16000,
        "upsample_initial_channel": 1024,
        "upsample_rates": [5, 4, 2, 2, 2], "upsample_kernel_sizes": [16, 16, 8, 4, 4],
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "normalize_before": False,
    })
    w("scheduler", "scheduler_config.json", {
        "num_train_timesteps": 1000, "beta_start": 0.0015, "beta_end": 0.0195,
        "beta_schedule": "scaled_linear", "prediction_type": "epsilon",
    })
    w("text_encoder", "config.json", {
        "projection_dim": 512,
        "text_config": {
            "vocab_size": 50265, "hidden_size": 768, "num_hidden_layers": 12,
            "num_attention_heads": 12, "intermediate_size": 3072,
            "max_position_embeddings": 514, "pad_token_id": 1,
        },
    })
    w("text_encoder_2", "config.json", {
        "vocab_size": 32128, "d_model": 1024, "d_kv": 64, "d_ff": 2816,
        "num_layers": 24, "num_heads": 16, "relative_attention_num_buckets": 32,
        "feed_forward_proj": "gated-gelu", "is_gated_act": True,
    })
    w("language_model", "config.json", {
        "vocab_size": 50257, "n_embd": 768, "n_layer": 12, "n_head": 12,
        "n_positions": 1024, "max_new_tokens": 8,
    })
    w("projection_model", "config.json", {
        "text_encoder_dim": 512, "text_encoder_1_dim": 1024, "langauge_model_dim": 768,
    })

    cfg = build_config(str(d))
    assert cfg.unet.block_out_channels == (128, 256, 384, 640)
    assert cfg.unet.down_block_has_attn == (False, True, True, True)
    assert cfg.unet.up_block_has_attn == (True, True, True, False)
    assert cfg.unet.cross_attention_dims == (None, 768, 1024, None)
    assert cfg.vae.scaling_factor == 0.9227
    assert cfg.vocoder.upsample_factor == 160
    assert cfg.t5.feed_forward_proj == "gated-gelu"
    assert cfg.gpt2.max_new_tokens == 8
    assert cfg.projection.language_model_dim == 768
    assert cfg.scheduler.beta_start == 0.0015
