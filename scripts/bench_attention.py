"""Microbenchmark: self-attention kernel variants at the UNet's hot shapes.

Usage (real TPU): python scripts/bench_attention.py

Times each variant with an in-jit lax.scan loop (host round-trip timing lies
on this backend — see docs/PERF.md) at the profile's dominant site:
B=16 (CFG batch), H=8, S=1000, D=32, bf16.
"""

from __future__ import annotations

import functools
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

    from ap_adapter_tpu.ops.attention import sdpa
    from ap_adapter_tpu.ops.pallas_self_attention import pallas_self_attention
    from ap_adapter_tpu.ops.pallas_packed_attention import packed_self_attention

    shapes = [
        (16, 1000, 8, 32),   # UNet level-1 self-attn (60 sites/step)
        (16, 4000, 1, 512),  # VAE mid attention (once per decode)
    ]
    n_inner = 20

    for b, s, h, d in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)

        variants = {"xla_sdpa": lambda q, k, v: sdpa(q, k, v)}
        sp = ((s + 511) // 512) * 512
        dp = ((d + 127) // 128) * 128
        if 2 * sp * dp * 4 + 512 * sp * 4 + 2 * 512 * dp * 4 < 8 * 1024 * 1024:
            variants["whole_kv_512"] = functools.partial(pallas_self_attention, tile_q=512)
        if d <= 128 and 128 % d == 0 and h % (128 // d) == 0:
            for tq in (128, 256, 512):
                variants[f"packed_{tq}"] = functools.partial(packed_self_attention, tile_q=tq)

        print(f"== B={b} S={s} H={h} D={d} (x{n_inner} in-jit) ==", flush=True)
        ref = None
        for name, fn in variants.items():
            def loop(q, k, v, fn=fn):
                def body(carry, _):
                    o = fn(q + carry * 0, k, v)
                    return jnp.mean(o.astype(jnp.float32)), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_inner)
                return out

            jl = jax.jit(loop)
            r = np.asarray(jl(q, k, v))  # compile + correctness anchor
            if ref is None:
                ref = r
            t0 = time.perf_counter()
            r2 = np.asarray(jl(q, k, v))
            dt = (time.perf_counter() - t0) / n_inner * 1e3
            ok = "" if abs(float(r2) - float(ref)) < 2e-2 else f"  MISMATCH ref={ref:.4f} got={float(r2):.4f}"
            print(f"  {name:16s} {dt:7.3f} ms/site{ok}", flush=True)


if __name__ == "__main__":
    main()
