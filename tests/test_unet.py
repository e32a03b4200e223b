"""UNet block parity (vs compact torch reimplementations of the diffusers
primitives) and full-model structural tests."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import UNetConfig
from ap_adapter_tpu.models.unet import AudioLDM2UNet
from ap_adapter_tpu.models.unet_blocks import ResnetBlock2D, Transformer2DModel
from ap_adapter_tpu.models.layers import get_timestep_embedding
from ap_adapter_tpu.convert.torch_import import _resnet_params, _transformer2d_params


# ---------------------------------------------------------------------------
# torch references (diffusers semantics, written independently for the test)
# ---------------------------------------------------------------------------


class TorchResnet(tnn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, groups=8, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchAttention(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        ctx_dim = ctx_dim or dim
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim), tnn.Identity()])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, n, d = x.shape
        h = self.heads
        q = self.to_q(x).view(b, n, h, d // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, h, d // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, h, d // h).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, n, d)
        return self.to_out[0](out)


class TorchBasicBlock(tnn.Module):
    def __init__(self, dim, heads, ctx_dim, double_self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, None, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, None if double_self else ctx_dim, heads)
        self.double_self = double_self
        self.norm3 = tnn.LayerNorm(dim)

        class GEGLU(tnn.Module):
            def __init__(self, d):
                super().__init__()
                self.proj = tnn.Linear(d, d * 8)

            def forward(self, x):
                a, g = self.proj(x).chunk(2, dim=-1)
                return a * F.gelu(g)

        self.ff = tnn.ModuleList([GEGLU(dim), tnn.Identity(), tnn.Linear(dim * 4, dim)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), None if self.double_self else ctx)
        return x + self.ff[2](self.ff[0](self.norm3(x)))


class TorchT2D(tnn.Module):
    def __init__(self, dim, heads, ctx_dim, layers, groups=8, double_self=False):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, dim, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TorchBasicBlock(dim, heads, ctx_dim, double_self) for _ in range(layers)]
        )
        self.proj_out = tnn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


def _sd(m, remap_ff=True):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    if remap_ff:
        sd = {k.replace("ff.0.proj", "ff.net.0.proj").replace("ff.2.", "ff.net.2."): v for k, v in sd.items()}
    return sd


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def test_resnet_block_parity(rng):
    torch.manual_seed(0)
    ref = TorchResnet(16, 32, 24).eval()
    x = rng.standard_normal((2, 16, 8, 4)).astype(np.float32)
    temb = rng.standard_normal((2, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    sd = {f"r.{k}": v for k, v in _sd(ref, remap_ff=False).items()}
    params = _resnet_params(sd, "r")
    got = ResnetBlock2D(32, groups=8).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(temb)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("double_self", [False, True])
def test_transformer2d_parity(rng, double_self):
    torch.manual_seed(1)
    dim, heads, ctx_dim, layers = 16, 2, 12, 2
    ref = TorchT2D(dim, heads, ctx_dim, layers, double_self=double_self).eval()
    x = rng.standard_normal((2, dim, 4, 3)).astype(np.float32)
    ctx = rng.standard_normal((2, 5, ctx_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()

    sd = {f"t.{k}": v for k, v in _sd(ref).items()}
    params = _transformer2d_params(sd, "t", layers, has_adapter=False)
    model = Transformer2DModel(
        heads, dim // heads, num_layers=layers,
        cross_attention_dim=None if double_self else ctx_dim, groups=8,
    )
    got = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        None if double_self else jnp.asarray(ctx),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )


def test_timestep_embedding_formula():
    """diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0."""

    t = jnp.asarray([0.0, 1.0, 999.0])
    emb = np.asarray(get_timestep_embedding(t, 8))
    half = 4
    exponent = -np.log(10000.0) * np.arange(half) / half
    freqs = np.exp(exponent)
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(emb, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# full UNet structural tests
# ---------------------------------------------------------------------------


TINY = UNetConfig(
    in_channels=8,
    out_channels=8,
    block_out_channels=(16, 16, 16, 16),
    cross_attention_dims=(None, 12, 20, None),
    num_attention_heads=2,
    norm_num_groups=8,
    adapter_cross_attention_dim=12,
    transformer_layers_per_block=1,
    layers_per_block=1,
    adapter_num_tokens=2,
)


@pytest.fixture(scope="module")
def tiny_unet():
    model = AudioLDM2UNet(TINY)
    sample = jnp.zeros((1, 16, 8, 8))
    ehs0 = jnp.zeros((1, 6, 12))
    ehs1 = jnp.zeros((1, 5, 20))
    params = model.init(
        jax.random.PRNGKey(0), sample, jnp.asarray([0.0]), ehs0, ehs1, None, 0.0
    )["params"]
    return model, params


def test_unet_output_shape(tiny_unet, rng):
    model, params = tiny_unet
    sample = jnp.asarray(rng.standard_normal((2, 16, 8, 8)).astype(np.float32))
    ehs0 = jnp.asarray(rng.standard_normal((2, 6, 12)).astype(np.float32))
    ehs1 = jnp.asarray(rng.standard_normal((2, 5, 20)).astype(np.float32))
    mask1 = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.int32))
    out = model.apply(
        {"params": params}, sample, jnp.asarray([10.0, 500.0]), ehs0, ehs1, mask1, 0.5
    )
    assert out.shape == (2, 16, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_adapter_scale_zero_equals_text_only(tiny_unet, rng):
    """With ip_scale=0 the audio tokens must not influence the output: the
    decoupled branch is purely additive (reference attention_processor.py:454)."""

    model, params = tiny_unet
    sample = jnp.asarray(rng.standard_normal((1, 16, 8, 8)).astype(np.float32))
    text = rng.standard_normal((1, 2, 12)).astype(np.float32)  # num_ip_tokens=2
    audio_a = rng.standard_normal((1, 4, 12)).astype(np.float32)
    audio_b = rng.standard_normal((1, 4, 12)).astype(np.float32)
    ehs1 = jnp.asarray(rng.standard_normal((1, 5, 20)).astype(np.float32))
    t = jnp.asarray([100.0])

    out_a = model.apply({"params": params}, sample, t,
                        jnp.asarray(np.concatenate([text, audio_a], axis=1)), ehs1, None, 0.0)
    out_b = model.apply({"params": params}, sample, t,
                        jnp.asarray(np.concatenate([text, audio_b], axis=1)), ehs1, None, 0.0)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    out_c = model.apply({"params": params}, sample, t,
                        jnp.asarray(np.concatenate([text, audio_a], axis=1)), ehs1, None, 0.7)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_c), atol=1e-4)


def test_unet_adapter_param_count(tiny_unet):
    _, params = tiny_unet
    flat = jax.tree_util.tree_leaves_with_path(params)
    ip = [jax.tree_util.keystr(p) for p, _ in flat if "ip" in jax.tree_util.keystr(p)]
    # adapted sites: down blocks 1,2,3 (1 layer) + mid + up blocks 0,1,2 (2 layers)
    # = (3*1 + 1 + 3*2) * 1 transformer block * 2 (k,v) = 20
    assert len(ip) == 20


def test_nearest_resize_matches_torch(rng):
    from ap_adapter_tpu.models.unet_blocks import nearest_resize_2d

    for (h, w, th, tw) in [(32, 2, 63, 4), (63, 4, 125, 8), (125, 8, 250, 16), (5, 3, 10, 6)]:
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(th, tw), mode="nearest"
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(nearest_resize_2d(jnp.asarray(x), th, tw))
        np.testing.assert_allclose(got, want, atol=0)


def test_unet_cn_text_only_mode(rng):
    """ControlNet-branch semantics (reference CNAttnProcessor2_0,
    attention_processor.py:538-623): with cn_text_only the 768-dim stream
    attends TEXT-ONLY — the output is invariant to the trailing AudioMAE
    tokens — and no adapter (ip) params are created."""

    import dataclasses

    cfg = dataclasses.replace(TINY, cn_text_only=True)
    model = AudioLDM2UNet(cfg)
    sample = jnp.asarray(rng.standard_normal((1, 16, 8, 8)).astype(np.float32))
    t = jnp.asarray([3.0])
    text = rng.standard_normal((1, 2, 12)).astype(np.float32)
    audio_a = rng.standard_normal((1, 4, 12)).astype(np.float32)
    audio_b = rng.standard_normal((1, 4, 12)).astype(np.float32)
    ehs1 = jnp.asarray(rng.standard_normal((1, 5, 20)).astype(np.float32))

    params = model.init(
        jax.random.PRNGKey(0), sample, t,
        jnp.asarray(np.concatenate([text, audio_a], axis=1)), ehs1, None, 0.7
    )["params"]
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert not [jax.tree_util.keystr(p) for p, _ in flat
                if "ip" in jax.tree_util.keystr(p)]

    out_a = model.apply({"params": params}, sample, t,
                        jnp.asarray(np.concatenate([text, audio_a], axis=1)),
                        ehs1, None, 0.7)
    out_b = model.apply({"params": params}, sample, t,
                        jnp.asarray(np.concatenate([text, audio_b], axis=1)),
                        ehs1, None, 0.7)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    # and the hoist path refuses this mode loudly
    from ap_adapter_tpu.models.hoist import precompute_cross_kv

    with pytest.raises(ValueError, match="cn_text_only"):
        precompute_cross_kv(params, cfg,
                            jnp.zeros((1, 6, 12)), jnp.zeros((1, 5, 20)),
                            None, jnp.float32)
