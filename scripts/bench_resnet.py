"""Microbenchmark: fused Pallas resnet block vs the XLA module math at the
real UNet shapes (CFG batch 48 = bench batch 24 x 2).

Timing method: in-jit lax.scan over ITERS applications (docs/PERF.md
methodology — subtract the ~0.7 ms/iter scan overhead measured with an
empty body, or compare the two paths which carry identical overhead).

Usage: python scripts/bench_resnet.py [batch]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ap_adapter_tpu.ops import pallas_resnet as prn

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
ITERS = 50

# (H, W, C_in, C_out): the UNet resnet shapes at 250x16 latents
SHAPES = [
    (250, 16, 128, 128),   # L0 down
    (250, 16, 384, 128),   # L0 up (concat skip)
    (125, 8, 128, 256),    # L1 entry
    (125, 8, 256, 256),    # L1 down
    (125, 8, 640, 256),    # L1 up
    (63, 4, 256, 384),     # L2 entry
    (63, 4, 384, 384),
    (63, 4, 768, 384),     # L2 up
    (32, 2, 384, 640),     # L3 entry
    (32, 2, 640, 640),     # L3 / mid
    (32, 2, 1280, 640),    # L3 up
]


def main():
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32),
                                dtype=jnp.bfloat16)
    total_fused = total_xla = 0.0
    for (h, w, cin, cout) in SHAPES:
        fits = prn.fused_resnet_fits(h, w, cin, cout)
        x = mk(B, h, w, cin)
        temb = mk(B, cout)
        args = (mk(cin), mk(cin), mk(3, 3, cin, cout), mk(cout),
                mk(cout), mk(cout), mk(3, 3, cout, cout), mk(cout))
        sc = (mk(1, 1, cin, cout), mk(cout)) if cin != cout else (None, None)

        def run(fn):
            def step(c, _):
                y = fn(c)
                # keep shapes closed: fold output back to input shape stat
                return c + 0 * jnp.mean(y).astype(c.dtype), None

            f = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=ITERS)[0])
            r = f(x)
            r.block_until_ready()
            t0 = time.perf_counter()
            r = f(x)
            np.asarray(r)  # true sync through the tunnel
            return (time.perf_counter() - t0) / ITERS * 1e3

        t_xla = run(lambda c: prn._xla_reference(
            c, temb, *args, sc[0], sc[1], 32, 1e-5))
        if fits:
            t_fused = run(lambda c: prn.fused_resnet_block(
                c, temb, *args, sc_w=sc[0], sc_b=sc[1], groups=32, eps=1e-5))
        else:
            t_fused = float("nan")
        total_xla += t_xla
        total_fused += t_fused if fits else t_xla
        print(f"[{h}x{w}, {cin}->{cout}] fits={fits} "
              f"xla={t_xla:.3f} ms fused={t_fused:.3f} ms", flush=True)
    print(f"TOTAL (one pass over shapes): xla={total_xla:.2f} ms "
          f"fused-where-fits={total_fused:.2f} ms")


if __name__ == "__main__":
    main()
