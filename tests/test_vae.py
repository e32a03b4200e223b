"""VAE structural tests: shapes, scale factor, downsample padding parity."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import VAEConfig
from ap_adapter_tpu.models.vae import AutoencoderKL, DownsampleVAE

CFG = VAEConfig(block_out_channels=(8, 8, 8), latent_channels=4, norm_num_groups=4,
                layers_per_block=1, scaling_factor=0.5)


def test_vae_roundtrip_shapes(rng):
    model = AutoencoderKL(CFG)
    mel = jnp.asarray(rng.standard_normal((2, 32, 16, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    params = model.init(key, mel, key)["params"]

    z = model.apply({"params": params}, mel, key, method=AutoencoderKL.encode)
    assert z.shape == (2, 8, 4, 4)  # T/4, F/4, latent_channels

    rec = model.apply({"params": params}, z / CFG.scaling_factor, method=AutoencoderKL.decode)
    assert rec.shape == mel.shape
    assert np.all(np.isfinite(np.asarray(rec)))


def test_vae_encode_is_stochastic_but_seeded(rng):
    model = AutoencoderKL(CFG)
    mel = jnp.asarray(rng.standard_normal((1, 16, 16, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    params = model.init(key, mel, key)["params"]
    z1 = model.apply({"params": params}, mel, jax.random.PRNGKey(1), method=AutoencoderKL.encode)
    z2 = model.apply({"params": params}, mel, jax.random.PRNGKey(1), method=AutoencoderKL.encode)
    z3 = model.apply({"params": params}, mel, jax.random.PRNGKey(2), method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1), np.asarray(z3))


def test_downsample_asymmetric_padding_matches_torch(rng):
    """diffusers VAE Downsample2D pads (0,1) right/bottom then stride-2 VALID."""

    x = rng.standard_normal((1, 4, 7, 5)).astype(np.float32)  # NCHW odd dims
    conv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=0)
    with torch.no_grad():
        want = conv(F.pad(torch.from_numpy(x), (0, 1, 0, 1))).numpy()

    params = {
        "conv": {
            "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": conv.bias.detach().numpy(),
        }
    }
    got = DownsampleVAE(6).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
    )
