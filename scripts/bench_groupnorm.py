"""Microbenchmark: fused Pallas GroupNorm+SiLU vs flax nn.GroupNorm at the
UNet's per-step shapes (CFG batch 16). Run on the real TPU."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )

    from ap_adapter_tpu.ops.pallas_groupnorm import fused_group_norm

    shapes = [  # (B, N=H*W, C) per level
        (16, 4000, 128),
        (16, 1000, 256),
        (16, 252, 384),
        (16, 64, 640),
    ]
    groups, n_inner = 32, 50

    for b, n, c in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
        gamma = jnp.asarray(rng.standard_normal(c), jnp.bfloat16)
        beta = jnp.asarray(rng.standard_normal(c), jnp.bfloat16)

        def flax_gn(x, gamma, beta):
            y = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.bfloat16,
                             use_bias=False, use_scale=False).apply({"params": {}}, x[:, :, None, :])
            y = y[:, :, 0, :] * gamma + beta
            return nn.silu(y)

        def pallas_gn(x, gamma, beta):
            return fused_group_norm(x, gamma, beta, groups, act=True)

        print(f"== B={b} N={n} C={c} (x{n_inner} in-jit) ==", flush=True)
        ref = None
        for name, fn in [("flax_gn_silu", flax_gn), ("pallas_fused", pallas_gn)]:
            def loop(x, gamma, beta, fn=fn):
                def body(carry, _):
                    o = fn(x + carry * 0, gamma, beta)
                    return jnp.mean(o.astype(jnp.float32)), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_inner)
                return out

            jl = jax.jit(loop)
            r = np.asarray(jl(x, gamma, beta))
            if ref is None:
                ref = r
            t0 = time.perf_counter()
            r2 = np.asarray(jl(x, gamma, beta))
            dt = (time.perf_counter() - t0) / n_inner * 1e3
            ok = "" if abs(float(r2) - float(ref)) < 1e-2 else f"  MISMATCH {ref:.5f} vs {float(r2):.5f}"
            print(f"  {name:14s} {dt:7.4f} ms{ok}", flush=True)


if __name__ == "__main__":
    main()
