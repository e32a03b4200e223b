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
