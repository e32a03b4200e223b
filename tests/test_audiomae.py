"""AudioMAE parity tests.

timm isn't installed, so the test builds an independent torch implementation
of the timm-style MAE encoder (fused-qkv pre-LN ViT) and checks the Flax
model against it after weight conversion. Pooling is checked against torch's
AvgPool2d/MaxPool2d.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import AudioMAEConfig
from ap_adapter_tpu.models.audiomae import AudioMAEEncoder, AudioMAECondition
from ap_adapter_tpu.models.layers import audiomae_pos_embed
from ap_adapter_tpu.ops.pooling import avg_max_pool_tokens
from ap_adapter_tpu.convert.torch_import import audiomae_encoder_params

CFG = AudioMAEConfig(img_size=(64, 32), patch_size=16, embed_dim=32, depth=3, num_heads=2)


class TorchBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.qkv = tnn.Linear(d, 3 * d)
        self.proj = tnn.Linear(d, d)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.Sequential(tnn.Linear(d, 4 * d), tnn.GELU(), tnn.Linear(4 * d, d))
        self.h = h

    def attn(self, x):
        b, n, d = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.h, d // self.h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        return self.proj(out.transpose(1, 2).reshape(b, n, d))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchMAE(tnn.Module):
    """forward_encoder_no_random_mask_no_average (models_mae.py:548-570)."""

    def __init__(self, cfg: AudioMAEConfig):
        super().__init__()
        self.cfg = cfg
        self.patch = tnn.Conv2d(1, cfg.embed_dim, cfg.patch_size, cfg.patch_size)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, cfg.embed_dim) * 0.02)
        t, f = cfg.grid_size
        pe = audiomae_pos_embed(cfg.embed_dim, (f, t), cls_token=True)
        self.register_buffer("pos_embed", torch.from_numpy(pe)[None])
        self.blocks = tnn.ModuleList([TorchBlock(cfg.embed_dim, cfg.num_heads) for _ in range(cfg.depth)])
        self.norm = tnn.LayerNorm(cfg.embed_dim, eps=1e-6)

    def forward(self, fbank):  # [B, T, F]
        x = self.patch(fbank[:, None])  # NCHW
        x = x.flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:]
        cls = (self.cls_token + self.pos_embed[:, :1]).expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def _torch_state_dict(model: TorchMAE):
    sd = {}
    sd["patch_embed.proj.weight"] = model.patch.weight.detach().numpy()
    sd["patch_embed.proj.bias"] = model.patch.bias.detach().numpy()
    sd["cls_token"] = model.cls_token.detach().numpy()
    for i, blk in enumerate(model.blocks):
        sd[f"blocks.{i}.norm1.weight"] = blk.norm1.weight.detach().numpy()
        sd[f"blocks.{i}.norm1.bias"] = blk.norm1.bias.detach().numpy()
        sd[f"blocks.{i}.attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
        sd[f"blocks.{i}.attn.qkv.bias"] = blk.qkv.bias.detach().numpy()
        sd[f"blocks.{i}.attn.proj.weight"] = blk.proj.weight.detach().numpy()
        sd[f"blocks.{i}.attn.proj.bias"] = blk.proj.bias.detach().numpy()
        sd[f"blocks.{i}.norm2.weight"] = blk.norm2.weight.detach().numpy()
        sd[f"blocks.{i}.norm2.bias"] = blk.norm2.bias.detach().numpy()
        sd[f"blocks.{i}.mlp.fc1.weight"] = blk.mlp[0].weight.detach().numpy()
        sd[f"blocks.{i}.mlp.fc1.bias"] = blk.mlp[0].bias.detach().numpy()
        sd[f"blocks.{i}.mlp.fc2.weight"] = blk.mlp[2].weight.detach().numpy()
        sd[f"blocks.{i}.mlp.fc2.bias"] = blk.mlp[2].bias.detach().numpy()
    sd["norm.weight"] = model.norm.weight.detach().numpy()
    sd["norm.bias"] = model.norm.bias.detach().numpy()
    return sd


@pytest.fixture(scope="module")
def torch_mae():
    torch.manual_seed(0)
    return TorchMAE(CFG).eval()


def test_encoder_parity_with_torch(torch_mae, rng):
    fbank = rng.standard_normal((2, *CFG.img_size)).astype(np.float32)
    with torch.no_grad():
        want = torch_mae(torch.from_numpy(fbank)).numpy()

    params = audiomae_encoder_params(_torch_state_dict(torch_mae), depth=CFG.depth)
    model = AudioMAEEncoder(CFG)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(fbank)))
    assert got.shape == want.shape == (2, 1 + CFG.num_patches, CFG.embed_dim)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pooling_matches_torch(rng):
    tokens = rng.standard_normal((2, 64 * 8, 16)).astype(np.float32)
    for tp, fp in [(1, 1), (2, 2), (4, 4), (8, 8), (2, 4)]:
        got = np.asarray(avg_max_pool_tokens(jnp.asarray(tokens), (64, 8), tp, fp))
        x = torch.from_numpy(tokens).transpose(1, 2).reshape(2, 16, 64, 8)
        want = (
            (torch.nn.functional.avg_pool2d(x, (tp, fp)) + torch.nn.functional.max_pool2d(x, (tp, fp))) / 2
        )
        want = want.flatten(2).transpose(1, 2).numpy()
        assert got.shape == want.shape == (2, 512 // (tp * fp), 16)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_condition_module_shapes(torch_mae, rng):
    fbank = rng.standard_normal((1, *CFG.img_size)).astype(np.float32)
    model = AudioMAECondition(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(fbank), 2, 2)["params"]
    out = model.apply({"params": params}, jnp.asarray(fbank), 2, 2)
    t, f = CFG.grid_size
    assert out.shape == (1, (t // 2) * (f // 2), CFG.embed_dim)

    uncond = model.apply(
        {"params": params}, 1, 2, 2, method=AudioMAECondition.unconditional
    )
    assert uncond.shape == out.shape
    assert np.all(np.asarray(uncond) == 0)


def test_pos_embed_reference_quirk():
    """Independent recomputation of the reference pos-embed (models_mae.py:87-151)."""

    embed_dim, gh, gw = 16, 3, 5

    def sincos(d, pos):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid = np.stack(np.meshgrid(np.arange(gw, dtype=np.float32), np.arange(gh, dtype=np.float32)))
    grid = grid.reshape(2, 1, gh, gw)
    want = np.concatenate([sincos(embed_dim // 2, grid[0]), sincos(embed_dim // 2, grid[1])], axis=1)
    want = np.concatenate([np.zeros((1, embed_dim)), want], axis=0)

    got = audiomae_pos_embed(embed_dim, (gh, gw), cls_token=True)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6, atol=1e-6)
