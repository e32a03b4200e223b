"""A/B the software-pipelined fused self-attention kernel (_kernel_pipe)
against the baseline (_kernel) at the UNet's dominant sites.

Methodology (r4): scalar-output scan-length slope (lengths 50/250, min of
5), so the axon tunnel's ~600 ms result-transfer fixed cost cancels — see
scripts/bench_softmax_maxfree.py. The maxsub baseline slope reproduces the
device trace's 1.41 ms/call at [48, 1000, 256].

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
    for (b, s, c, heads) in ((48, 1000, 256, 8), (48, 252, 384, 8)):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, s, c)) * 0.1, jnp.bfloat16)
        lns = jnp.ones((c,), jnp.bfloat16)
        lnb = jnp.zeros((c,), jnp.bfloat16)
        wq, wk, wv, wo = (
            jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
            for _ in range(4))
        bo = jnp.zeros((c,), jnp.bfloat16)

        print(f"== B={b} S={s} C={c} H={heads} ==", flush=True)
        for name, pipe in (("baseline", False), ("pipelined", True)):
            def make(n, pipe=pipe):
                def loop(x):
                    def body(carry, _):
                        y = fused_ln_self_attention(
                            carry, lns, lnb, wq, wk, wv, wo, bo, heads,
                            pipe=pipe)
                        return y * 0.5, None
                    y, _ = jax.lax.scan(body, x, None, length=n)
                    return jnp.sum(y.astype(jnp.float32))
                return jax.jit(loop)

            ts = {}
            for n in (50, 250):
                f = make(n)
                float(f(x))
                best = 1e9
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(f(x))
                    best = min(best, time.perf_counter() - t0)
                ts[n] = best
            slope = (ts[250] - ts[50]) / 200 * 1e3
            print(f"  {name:<10s} {slope:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
