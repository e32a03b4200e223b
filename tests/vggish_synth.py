"""Deterministic synthetic torchvggish state dict, shared by the fixture
capture (scripts/make_golden_fixtures.make_vggish — loads it into a plain
torch replica) and the consuming test (tests/test_golden_pipeline.py
test_golden_vggish — converts it with convert.torch_import.vggish_params).

The real VGGish weights are 72 M params (fc1 alone is 12288x4096 fp32 =
200 MB incompressible random), so the golden fixture stores only inputs +
torch outputs and both sides rebuild the weights from this one numpy stream.
A drifted numpy Generator would change both sides identically on the JAX
side but NOT the committed torch outputs — the consuming test guards that
with a stored parameter checksum and fails loudly.
"""

from __future__ import annotations

import numpy as np

# (torchvggish Sequential index, fan_in geometry) in state-dict order
CONVS = [(1, 64, 0), (64, 128, 3), (128, 256, 6), (256, 256, 8),
         (256, 512, 11), (512, 512, 13)]
FCS = [(0, 12288, 4096), (2, 4096, 4096), (4, 4096, 128)]


def synth_state_dict(seed: int = 0) -> dict:
    """torchvggish-keyed {features.N|embeddings.N}.{weight,bias} numpy dict,
    variance-scaled (0.5/sqrt(fan_in)) so 6 convs + 3 FCs stay O(1)."""

    rng = np.random.default_rng(seed)
    sd = {}
    for cin, cout, idx in CONVS:
        fan_in = cin * 9
        sd[f"features.{idx}.weight"] = (
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
            * (0.5 / np.sqrt(fan_in)))
        sd[f"features.{idx}.bias"] = (
            rng.standard_normal(cout).astype(np.float32) * 0.05)
    for idx, din, dout in FCS:
        sd[f"embeddings.{idx}.weight"] = (
            rng.standard_normal((dout, din)).astype(np.float32)
            * (0.5 / np.sqrt(din)))
        sd[f"embeddings.{idx}.bias"] = (
            rng.standard_normal(dout).astype(np.float32) * 0.05)
    return sd


def state_dict_checksum(sd: dict) -> float:
    return float(sum(np.abs(v.astype(np.float64)).sum() for v in sd.values()))
