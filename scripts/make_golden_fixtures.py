"""Generate committed golden fixtures under tests/golden/.

Runs the torch oracles available in-env — HF ``transformers`` small-config
models (CLAP text / T5 / GPT-2 / SpeechT5 HiFi-GAN) and the reference's own
attention processors (/root/reference/APadapter/ap_adapter/
attention_processor.py) — on fixed seeds, converts their weights with
convert/torch_import.py, and stores (config, converted params, inputs,
expected outputs) as .npz. tests/test_golden_pipeline.py then re-checks
parity WITHOUT torch/transformers installed: the fixtures make the oracle
portable.

Regenerate with:  python scripts/make_golden_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
OUT = os.path.join(REPO, "tests", "golden")


def _flat(params, prefix="param"):
    """Flax param tree -> {"param/a/b": array} npz-safe dict."""

    from flax import traverse_util

    return {
        f"{prefix}/" + "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(params).items()
    }


def _save(name: str, **arrays) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({os.path.getsize(path)//1024} KiB)")


def _np_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def make_clap_text():
    import torch
    from transformers import ClapTextConfig as HFClapTextConfig
    from transformers.models.clap.modeling_clap import ClapTextModelWithProjection

    from ap_adapter_tpu.convert import torch_import as ti

    cfg = dict(vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
               intermediate_size=64, max_position_embeddings=64, projection_dim=16)
    hf_cfg = HFClapTextConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64, projection_dim=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = ClapTextModelWithProjection(hf_cfg).eval()
    ids = np.array([[5, 9, 17, 33, 2, 1, 1, 1], [5, 44, 2, 1, 1, 1, 1, 1]], np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
        want = torch.nn.functional.normalize(out.text_embeds, dim=-1).numpy()
    params = ti.clap_text_params(_np_sd(hf), num_layers=2)
    _save("clap_text", config_json=json.dumps(cfg), ids=ids, mask=mask,
          want=want, **_flat(params))


def make_t5():
    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from ap_adapter_tpu.convert import torch_import as ti

    cfg = dict(vocab_size=99, d_model=32, d_kv=8, d_ff=48, num_layers=3,
               num_heads=4, relative_attention_num_buckets=8,
               relative_attention_max_distance=20)
    hf_cfg = HFT5Config(
        vocab_size=99, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    ids = np.array([[3, 7, 11, 13, 0, 0], [3, 5, 0, 0, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    params = ti.t5_encoder_params(_np_sd(hf), num_layers=3)
    _save("t5", config_json=json.dumps(cfg), ids=ids, mask=mask, want=want,
          **_flat(params))


def make_gpt2():
    import torch
    from transformers import GPT2Config as HFGPT2Config, GPT2Model as HFGPT2Model

    from ap_adapter_tpu.convert import torch_import as ti

    cfg = dict(vocab_size=50, n_embd=32, n_layer=2, n_head=2, n_positions=64)
    hf_cfg = HFGPT2Config(
        vocab_size=50, n_embd=32, n_layer=2, n_head=2, n_positions=64,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(1)
    hf = HFGPT2Model(hf_cfg).eval()
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((2, 5, 32)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        want_fwd = hf(inputs_embeds=torch.from_numpy(embeds),
                      attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()

    # AR hidden-state loop (reference pipeline_audioldm2.py:231-270)
    steps = 4
    gen_mask = np.ones((2, 5), np.int64)
    with torch.no_grad():
        inputs = torch.from_numpy(embeds)
        attn = torch.from_numpy(gen_mask)
        past = None
        for _ in range(steps):
            cur = inputs if past is None else inputs[:, -1:]
            out = hf(inputs_embeds=cur, attention_mask=attn,
                     past_key_values=past, use_cache=True)
            past = out.past_key_values
            inputs = torch.cat([inputs, out.last_hidden_state[:, -1:]], dim=1)
            attn = torch.cat([attn, torch.ones(2, 1, dtype=torch.long)], dim=-1)
        want_gen = inputs[:, -steps:].numpy()

    params = ti.gpt2_params(_np_sd(hf), num_layers=2)
    _save("gpt2", config_json=json.dumps(cfg), embeds=embeds, mask=mask,
          want_fwd=want_fwd, gen_mask=gen_mask,
          gen_steps=np.int64(steps), want_gen=want_gen, **_flat(params))


def make_vocoder():
    import torch
    from transformers import SpeechT5HifiGan, SpeechT5HifiGanConfig

    from ap_adapter_tpu.convert.torch_import import vocoder_params
    from ap_adapter_tpu.configs import VocoderConfig

    cfg = dict(model_in_dim=8, upsample_initial_channel=16,
               upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
               resblock_kernel_sizes=(3, 5),
               resblock_dilation_sizes=((1, 3), (1, 3)), normalize_before=False)
    hf_cfg = SpeechT5HifiGanConfig(
        model_in_dim=8, upsample_initial_channel=16, upsample_rates=[4, 2],
        upsample_kernel_sizes=[8, 4], resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]], normalize_before=False,
        leaky_relu_slope=0.1,
    )
    torch.manual_seed(0)
    hf = SpeechT5HifiGan(hf_cfg).eval()
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 20, 8)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(mel)).numpy()
    params = vocoder_params(_np_sd(hf), VocoderConfig(**cfg))
    _save("vocoder", config_json=json.dumps(cfg), mel=mel, want=want,
          **_flat(params))


def make_adapter():
    """Reference attention processors as oracles (the strongest parity
    evidence: the reference's own code). Reuses the duck-type harness from
    tests/test_golden_adapter.py."""

    import torch
    import test_golden_adapter as tga

    def dump(name, heads, dim_head, query_dim, cross_dim, case):
        torch.manual_seed(hash(name) % (2**31))
        attn = tga.RefAttention(query_dim, cross_dim, heads, dim_head)
        meta = dict(heads=heads, dim_head=dim_head, query_dim=query_dim,
                    cross_dim=cross_dim, case=case)
        b, n_q = 2, 40
        x = torch.randn(b, n_q, query_dim)
        if case == "ip":
            num_tokens, n_audio, scale = 8, 128, 0.55
            proc = tga.ref.IPAttnProcessor2_0(
                hidden_size=heads * dim_head, name="t",
                cross_attention_dim=cross_dim, num_tokens=num_tokens, scale=scale)
            ctx = torch.randn(b, num_tokens + n_audio, cross_dim)
            with torch.no_grad():
                want = proc(attn, x, encoder_hidden_states=ctx).numpy()
            params = tga._flax_params_from_torch(attn, proc)
            meta.update(num_tokens=num_tokens, scale=scale, use_adapter=True)
            extra = {}
        elif case == "plain_masked":
            n_kv = 12
            proc = tga.ref.AttnProcessor2_0()
            ctx = torch.randn(b, n_kv, cross_dim)
            keep = torch.ones(b, n_kv)
            keep[:, -3:] = 0.0
            bias = ((1.0 - keep) * -10000.0).unsqueeze(1)
            with torch.no_grad():
                want = proc(attn, x, encoder_hidden_states=ctx,
                            attention_mask=bias).numpy()
            params = tga._flax_params_from_torch(attn)
            meta.update(use_adapter=False)
            extra = {"bias": bias.numpy()}
        elif case == "cn":
            num_tokens, n_audio = 8, 64
            proc = tga.ref.CNAttnProcessor2_0(num_tokens=num_tokens)
            ctx = torch.randn(b, num_tokens + n_audio, cross_dim)
            with torch.no_grad():
                want = proc(attn, x, encoder_hidden_states=ctx).numpy()
            params = tga._flax_params_from_torch(attn)
            meta.update(num_tokens=num_tokens, use_adapter=False)
            extra = {}
        else:
            raise ValueError(case)
        _save(name, meta_json=json.dumps(meta), x=x.numpy(), ctx=ctx.numpy(),
              want=want, **extra, **_flat(params))

    # small dims keep the committed fixtures a few hundred KiB; the live
    # full-dim oracle runs stay in tests/test_golden_adapter.py
    dump("adapter_ip", 8, 16, 128, 96, "ip")
    dump("adapter_plain_masked", 4, 16, 64, 96, "plain_masked")
    dump("adapter_cn", 4, 16, 64, 96, "cn")


def main() -> None:
    make_clap_text()
    make_t5()
    make_gpt2()
    make_vocoder()
    make_adapter()


if __name__ == "__main__":
    main()
