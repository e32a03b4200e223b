"""A/B the software-pipelined fused self-attention kernel (_kernel_pipe)
against the baseline (_kernel) at the UNet's dominant site:
[B=48, S=1000, C=256], 8 heads of 32, bf16 — 30 sites x 2 calls/step in the
batch-24 serving trace (84 ms/step). In-jit lax.scan timing (host timing
lies on this backend); both variants share the loop so the fixed per-iter
overhead cancels in the A/B.

Usage (real TPU): python scripts/bench_fused_attn_pipe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )

    from ap_adapter_tpu.ops.pallas_fused_block import fused_ln_self_attention

    # (48, 4000, 128) scoped-VMEM-OOMs the pipelined variant (27.2 MB of
    # simultaneously-live logits blocks > 16 MB) — not a routed site anyway.
    shapes = [(48, 1000, 256, 8), (48, 252, 384, 8)]
    n_inner = 30
    for b, s, c, heads in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, s, c)) * 0.1, jnp.bfloat16)
        lns = jnp.ones((c,), jnp.bfloat16)
        lnb = jnp.zeros((c,), jnp.bfloat16)
        wq, wk, wv, wo = (jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
                          for _ in range(4))
        bo = jnp.zeros((c,), jnp.bfloat16)

        outs = {}
        print(f"== B={b} S={s} C={c} H={heads} (x{n_inner} in-jit) ==", flush=True)
        for name, pipe in (("baseline", False), ("pipelined", True)):
            def loop(x, pipe=pipe):
                def body(carry, _):
                    y = fused_ln_self_attention(
                        carry, lns, lnb, wq, wk, wv, wo, bo, heads, pipe=pipe)
                    return y * 0.5, None
                y, _ = jax.lax.scan(body, x, None, length=n_inner)
                return y
            f = jax.jit(loop)
            r = np.asarray(f(x))  # compile + parity sample
            outs[name] = r
            t0 = time.perf_counter()
            np.asarray(f(x))
            dt = (time.perf_counter() - t0) / n_inner * 1e3
            print(f"  {name:<10s} {dt:7.3f} ms/call", flush=True)
        err = np.abs(outs["baseline"].astype(np.float32)
                     - outs["pipelined"].astype(np.float32)).max()
        print(f"  max |baseline - pipelined| after {n_inner} iters: {err:.3e}")


if __name__ == "__main__":
    main()
