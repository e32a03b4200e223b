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
