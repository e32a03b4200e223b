"""A/B the clamped max-free softmax (default) against the classic
rowwise-max form (AP_ATTN_MAXSUB=1) in the fused self-attention kernel:

    python scripts/bench_softmax_maxfree.py
    AP_ATTN_MAXSUB=1 python scripts/bench_softmax_maxfree.py

(module-level env switch -> separate processes).

Methodology note (r4): through the axon tunnel, returning the [48,1000,256]
result costs ~600 ms of D2H that swamps a 1.4 ms kernel and fluctuates by
hundreds of ms run-to-run — early A/Bs timed THAT. This script returns a
scalar reduction and reports the slope between scan lengths 50 and 250, so
the fixed dispatch cost cancels; the maxsub slope reproduces the device
trace's 1.41 ms/call at the dominant site.
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

    from ap_adapter_tpu.ops import pallas_fused_block as pfb

    mode = "maxsub" if pfb._MAXSUB else "maxfree"
    for (b, s, c, heads) in ((48, 1000, 256, 8), (48, 252, 384, 8)):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, s, c)) * 0.1, jnp.bfloat16)
        lns = jnp.ones((c,), jnp.bfloat16)
        lnb = jnp.zeros((c,), jnp.bfloat16)
        wq, wk, wv, wo = (
            jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
            for _ in range(4))
        bo = jnp.zeros((c,), jnp.bfloat16)

        def make(n):
            def loop(x):
                def body(carry, _):
                    y = pfb.fused_ln_self_attention(
                        carry, lns, lnb, wq, wk, wv, wo, bo, heads)
                    return y * 0.5, None
                y, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(y.astype(jnp.float32))  # scalar: no bulk D2H
            return jax.jit(loop)

        ts = {}
        for n in (50, 250):
            f = make(n)
            float(f(x))  # compile
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(x))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        slope = (ts[250] - ts[50]) / 200 * 1e3
        print(f"{mode} B={b} S={s} C={c}: {slope:.3f} ms/call "
              f"(fixed {ts[50] * 1e3 - 50 * slope:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
