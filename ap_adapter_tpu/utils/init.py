"""Fast parameter initialization for benchmarks and compile checks.

``module.init`` on a 740M-param model builds one giant RNG graph that the TPU
compiler chews on for minutes. For random-weight use cases (benchmarks,
compile checks, tests at full scale) we only need correctly-shaped,
numerically sane values: eval_shape the init, then fill leaves host-side with
numpy (ones for norm scales, zeros for biases, small normals for kernels).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def fast_init(init_fn, *args, seed: int = 0) -> Any:
    """eval_shape ``init_fn(rng, *args)`` and fill the pytree host-side."""

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *args)
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        name = keys[-1] if keys else ""
        shape, dtype = leaf.shape, leaf.dtype
        if name in ("scale",) or name.endswith("sos_embed") or name.endswith("eos_embed") \
           or name in ("sos_embed", "eos_embed", "sos_embed_1", "eos_embed_1"):
            return np.ones(shape, dtype)
        if name == "bias":
            return np.zeros(shape, dtype)
        return rng.normal(0.0, 0.02, size=shape).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
