"""Golden parity vs the reference's OWN attention processors.

The reference's core adapter file
(/root/reference/APadapter/ap_adapter/attention_processor.py) imports only
torch + stdlib (:1-6), so we can import it directly and run the actual
``IPAttnProcessor2_0`` (:297-470), ``AttnProcessor2_0`` (:199-294) and
``CNAttnProcessor2_0`` (:538-623) against our Flax ``CrossAttention`` with
the same (converted) weights. This is the strongest parity evidence
available without a network: the reference code itself is the oracle.

The ``attn`` argument is a duck-type of diffusers' ``Attention`` module
(to_q/to_k/to_v/to_out[0|1], heads, prepare_attention_mask) — the exact
attribute surface the reference processors touch
(attention_processor.py:388-470). ``prepare_attention_mask`` reproduces
diffusers' semantics: pad additive bias to target length with 0, then
repeat_interleave over heads (out_dim=3).
"""

from __future__ import annotations

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from ap_adapter_tpu.models.unet_blocks import CrossAttention  # noqa: E402
from ap_adapter_tpu.ops.attention import sdpa, strip_adapter_tokens  # noqa: E402

REF_PATH = "/root/reference/APadapter/ap_adapter/attention_processor.py"


pytestmark = pytest.mark.quick

def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_attention_processor", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_attention_processor"] = mod
    spec.loader.exec_module(mod)
    return mod


ref = _load_reference_module()


class RefAttention(tnn.Module):
    """Duck-type of diffusers.models.attention_processor.Attention with the
    attribute surface the reference processors read."""

    def __init__(self, query_dim, cross_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(cross_dim or query_dim, inner, bias=False)
        self.to_v = tnn.Linear(cross_dim or query_dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, query_dim), tnn.Dropout(0.0)])
        self.spatial_norm = None
        self.group_norm = None
        self.norm_cross = False
        self.residual_connection = False
        self.rescale_output_factor = 1.0

    def prepare_attention_mask(self, attention_mask, target_length, batch_size, out_dim=3):
        head_size = self.heads
        if attention_mask is None:
            return None
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = tF.pad(
                attention_mask, (0, target_length - current_length), value=0.0
            )
        if attention_mask.shape[0] < batch_size * head_size:
            attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        return attention_mask

    # used by the legacy (bmm) CNAttnProcessor only
    def head_to_batch_dim(self, t):
        b, s, d = t.shape
        t = t.reshape(b, s, self.heads, d // self.heads).permute(0, 2, 1, 3)
        return t.reshape(b * self.heads, s, d // self.heads)

    def batch_to_head_dim(self, t):
        bh, s, hd = t.shape
        b = bh // self.heads
        t = t.reshape(b, self.heads, s, hd).permute(0, 2, 1, 3)
        return t.reshape(b, s, self.heads * hd)

    def get_attention_scores(self, query, key, attention_mask=None):
        scale = query.shape[-1] ** -0.5
        scores = torch.baddbmm(
            torch.zeros(query.shape[0], query.shape[1], key.shape[1]),
            query,
            key.transpose(-1, -2),
            beta=0,
            alpha=scale,
        ) if attention_mask is None else torch.baddbmm(
            attention_mask, query, key.transpose(-1, -2), beta=1, alpha=scale
        )
        return scores.softmax(dim=-1)


def _flax_params_from_torch(attn: RefAttention, proc=None):
    """torch Linear [out,in] -> flax Dense kernel [in,out]."""

    def k(lin):
        return jnp.asarray(lin.weight.detach().numpy().T)

    params = {
        "to_q": {"kernel": k(attn.to_q)},
        "to_k": {"kernel": k(attn.to_k)},
        "to_v": {"kernel": k(attn.to_v)},
        "to_out": {
            "kernel": k(attn.to_out[0]),
            "bias": jnp.asarray(attn.to_out[0].bias.detach().numpy()),
        },
    }
    if proc is not None:
        params["to_k_ip"] = {"kernel": k(proc.to_k_ip)}
        params["to_v_ip"] = {"kernel": k(proc.to_v_ip)}
    return params


@pytest.mark.parametrize("heads,dim_head,query_dim", [(8, 48, 384), (8, 96, 768)])
def test_golden_ip_attn_processor(heads, dim_head, query_dim):
    """IPAttnProcessor2_0 (attention_processor.py:297-470), no mask — the
    path the UNet actually exercises at the 32 adapter sites (the 768-dim
    stream carries no attention mask, modeling_audioldm2.py:1140-1156)."""

    torch.manual_seed(0)
    b, n_q, num_tokens, n_audio = 2, 40, 8, 128
    cross_dim, scale = 768, 0.55

    attn = RefAttention(query_dim, cross_dim, heads, dim_head)
    proc = ref.IPAttnProcessor2_0(
        hidden_size=heads * dim_head, name="t", cross_attention_dim=cross_dim,
        num_tokens=num_tokens, scale=scale,
    )
    x = torch.randn(b, n_q, query_dim)
    ctx = torch.randn(b, num_tokens + n_audio, cross_dim)
    with torch.no_grad():
        ref_out = proc(attn, x, encoder_hidden_states=ctx).numpy()

    module = CrossAttention(
        heads=heads, dim_head=dim_head, out_dim=query_dim,
        use_adapter=True, num_ip_tokens=num_tokens,
    )
    params = _flax_params_from_torch(attn, proc)
    out = module.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        ip_scale=scale,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-5)


def test_golden_ip_attn_processor_mask_width_hack():
    """The reference's attention-mask width hack
    (attention_processor.py:424-428): a [B,1,S_full] additive bias is
    prepared to [B,H,1,S_full], then ``split(target[2]=1, dim=3)[0]``
    keeps only the FIRST key column, which SDPA broadcasts over all 8 text
    keys. Parity = our module fed ``mask_bias[..., :1]``."""

    torch.manual_seed(1)
    b, n_q, num_tokens, n_audio = 2, 16, 8, 64
    heads, dim_head, query_dim, cross_dim = 8, 48, 384, 768

    attn = RefAttention(query_dim, cross_dim, heads, dim_head)
    proc = ref.IPAttnProcessor2_0(
        hidden_size=heads * dim_head, name="t", cross_attention_dim=cross_dim,
        num_tokens=num_tokens, scale=0.5,
    )
    x = torch.randn(b, n_q, query_dim)
    ctx = torch.randn(b, num_tokens + n_audio, cross_dim)
    # additive -10000 bias over the full context, as the UNet builds it
    # (modeling_audioldm2.py:741-747)
    keep = torch.ones(b, num_tokens + n_audio)
    keep[0, 0] = 0.0  # make the first column non-trivial
    bias = ((1.0 - keep) * -10000.0).unsqueeze(1)
    with torch.no_grad():
        ref_out = proc(attn, x, encoder_hidden_states=ctx, attention_mask=bias).numpy()

    module = CrossAttention(
        heads=heads, dim_head=dim_head, out_dim=query_dim,
        use_adapter=True, num_ip_tokens=num_tokens,
    )
    params = _flax_params_from_torch(attn, proc)
    mask_bias = jnp.asarray(bias.numpy())[:, None, :, :1]  # [B,1,1,1]
    out = module.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        mask_bias=mask_bias, ip_scale=0.5,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-5)


def test_golden_plain_attn_processor_cross_masked():
    """AttnProcessor2_0 (attention_processor.py:199-294) with a padding
    bias — the 1024-dim (T5/CLAP) stream path."""

    torch.manual_seed(2)
    b, n_q, n_kv = 2, 40, 12
    heads, dim_head, query_dim, cross_dim = 8, 48, 384, 1024

    attn = RefAttention(query_dim, cross_dim, heads, dim_head)
    proc = ref.AttnProcessor2_0()
    x = torch.randn(b, n_q, query_dim)
    ctx = torch.randn(b, n_kv, cross_dim)
    keep = torch.ones(b, n_kv)
    keep[:, -3:] = 0.0
    bias = ((1.0 - keep) * -10000.0).unsqueeze(1)
    with torch.no_grad():
        ref_out = proc(attn, x, encoder_hidden_states=ctx, attention_mask=bias).numpy()

    module = CrossAttention(heads=heads, dim_head=dim_head, out_dim=query_dim)
    params = _flax_params_from_torch(attn)
    mask_bias = jnp.asarray(bias.numpy())[:, None, :, :]  # [B,1,1,S]
    out = module.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        mask_bias=mask_bias,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-5)


def test_golden_plain_attn_processor_2d_context_guard():
    """The 2-D encoder-states unsqueeze guard
    (attention_processor.py:239-240): a [S,C] context is promoted to
    [1,S,C]. Our side: explicit reshape before the module."""

    torch.manual_seed(3)
    n_q, n_kv = 10, 6
    heads, dim_head, query_dim, cross_dim = 4, 32, 128, 256

    attn = RefAttention(query_dim, cross_dim, heads, dim_head)
    proc = ref.AttnProcessor2_0()
    x = torch.randn(1, n_q, query_dim)
    ctx_2d = torch.randn(n_kv, cross_dim)
    with torch.no_grad():
        ref_out = proc(attn, x, encoder_hidden_states=ctx_2d).numpy()

    module = CrossAttention(heads=heads, dim_head=dim_head, out_dim=query_dim)
    params = _flax_params_from_torch(attn)
    out = module.apply(
        {"params": params}, jnp.asarray(x.numpy()),
        jnp.asarray(ctx_2d.numpy())[None],
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-5)


def test_golden_self_attention():
    """AttnProcessor2_0 self-attention (encoder_hidden_states=None)."""

    torch.manual_seed(4)
    b, n = 2, 64
    heads, dim_head, query_dim = 8, 48, 384

    attn = RefAttention(query_dim, None, heads, dim_head)
    proc = ref.AttnProcessor2_0()
    x = torch.randn(b, n, query_dim)
    with torch.no_grad():
        ref_out = proc(attn, x).numpy()

    module = CrossAttention(heads=heads, dim_head=dim_head, out_dim=query_dim)
    params = _flax_params_from_torch(attn)
    out = module.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-5)


def test_golden_4d_input_reshape():
    """4-D [B,C,H,W] input path (attention_processor.py:364-367): reshaped
    to [B,HW,C] and back. Our UNet passes tokens already flattened (NHWC ->
    [B,HW,C]); parity = same tokens, same output."""

    torch.manual_seed(5)
    b, c, h, w = 2, 384, 5, 4
    heads, dim_head = 8, 48

    attn = RefAttention(c, 768, heads, dim_head)
    proc = ref.IPAttnProcessor2_0(
        hidden_size=heads * dim_head, name="t", cross_attention_dim=768,
        num_tokens=8, scale=0.5,
    )
    x4 = torch.randn(b, c, h, w)
    ctx = torch.randn(b, 8 + 32, 768)
    with torch.no_grad():
        ref_out = proc(attn, x4, encoder_hidden_states=ctx).numpy()

    module = CrossAttention(
        heads=heads, dim_head=dim_head, out_dim=c, use_adapter=True,
        num_ip_tokens=8,
    )
    params = _flax_params_from_torch(attn, proc)
    tokens = jnp.asarray(x4.numpy()).reshape(b, c, h * w).transpose(0, 2, 1)
    out = module.apply(
        {"params": params}, tokens, jnp.asarray(ctx.numpy()), ip_scale=0.5
    )
    out4 = np.asarray(out).transpose(0, 2, 1).reshape(b, c, h, w)
    np.testing.assert_allclose(out4, ref_out, atol=2e-5, rtol=2e-5)


def test_golden_cn_attn_processor_2_0():
    """CNAttnProcessor2_0 (attention_processor.py:538-623): drop the LAST
    num_tokens context entries, attend text-only. Our equivalent is
    strip_adapter_tokens + plain attention (ops/attention.py:110-116)."""

    torch.manual_seed(6)
    b, n_q, n_text, num_tokens = 2, 20, 12, 8
    heads, dim_head, query_dim, cross_dim = 8, 48, 384, 768

    attn = RefAttention(query_dim, cross_dim, heads, dim_head)
    proc = ref.CNAttnProcessor2_0(num_tokens=num_tokens)
    x = torch.randn(b, n_q, query_dim)
    ctx = torch.randn(b, n_text + num_tokens, cross_dim)
    with torch.no_grad():
        ref_out = proc(attn, x, encoder_hidden_states=ctx).numpy()

    module = CrossAttention(heads=heads, dim_head=dim_head, out_dim=query_dim)
    params = _flax_params_from_torch(attn)
    ctx_j = strip_adapter_tokens(jnp.asarray(ctx.numpy()), num_tokens)
    out = module.apply({"params": params}, jnp.asarray(x.numpy()), ctx_j)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-5)


def test_golden_legacy_ip_attn_processor_weight_mirroring():
    """Legacy IPAttnProcessor (attention_processor.py:80-196) deep-copies
    attn.to_k/to_v weights into the ip projections EVERY call (:159-162) —
    i.e. its ip branch is attn over to_k(ip_ctx)/to_v(ip_ctx) — and splits
    the context at len//2 (:146-150), NOT at num_tokens. Parity: our module
    with num_ip_tokens = len//2 and to_k_ip := to_k, to_v_ip := to_v."""

    torch.manual_seed(7)
    b, n_q, n_text, n_audio = 2, 16, 20, 20
    heads, dim_head, query_dim, cross_dim = 8, 48, 384, 768

    attn = RefAttention(query_dim, cross_dim, heads, dim_head)
    proc = ref.IPAttnProcessor(
        hidden_size=heads * dim_head, cross_attention_dim=cross_dim,
        num_tokens=n_audio, scale=0.5,
    )
    x = torch.randn(b, n_q, query_dim)
    ctx = torch.randn(b, n_text + n_audio, cross_dim)
    with torch.no_grad():
        ref_out = proc(attn, x, encoder_hidden_states=ctx).numpy()

    module = CrossAttention(
        heads=heads, dim_head=dim_head, out_dim=query_dim,
        use_adapter=True, num_ip_tokens=n_text,
    )
    params = _flax_params_from_torch(attn, proc)
    params["to_k_ip"] = {"kernel": params["to_k"]["kernel"]}
    params["to_v_ip"] = {"kernel": params["to_v"]["kernel"]}
    out = module.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        ip_scale=0.5,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5, rtol=2e-5)
