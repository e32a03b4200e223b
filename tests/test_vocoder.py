"""HiFi-GAN parity vs transformers SpeechT5HifiGan (torch CPU)."""

import numpy as np
import torch

import jax.numpy as jnp

from ap_adapter_tpu.configs import VocoderConfig
from ap_adapter_tpu.models.vocoder import HiFiGAN
from ap_adapter_tpu.convert.torch_import import vocoder_params


def test_vocoder_parity(rng):
    from transformers import SpeechT5HifiGanConfig, SpeechT5HifiGan

    hf_cfg = SpeechT5HifiGanConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=[4, 2],
        upsample_kernel_sizes=[8, 4],
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        normalize_before=False,
        leaky_relu_slope=0.1,
    )
    torch.manual_seed(0)
    hf = SpeechT5HifiGan(hf_cfg).eval()

    cfg = VocoderConfig(
        model_in_dim=8,
        upsample_initial_channel=16,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        normalize_before=False,
    )
    mel = rng.standard_normal((2, 20, 8)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(mel)).numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = vocoder_params(sd, cfg)
    got = np.asarray(HiFiGAN(cfg).apply({"params": params}, jnp.asarray(mel)))
    assert got.shape == (2, 20 * 8) == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vocoder_upsample_factor():
    cfg = VocoderConfig()
    assert cfg.upsample_factor == 160  # 10 ms hop at 16 kHz
