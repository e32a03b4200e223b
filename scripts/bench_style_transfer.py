"""Time the SDEdit style-transfer path on the real TPU (BASELINE.md row 2):
batch 8, 50-step schedule truncated to the last 26 steps, pooling 4x4,
guidance 9.5 — the style_transfer task template."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("AP_BENCH_BATCH", "8"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )

    from ap_adapter_tpu.configs import PipelineConfig, get_task_config
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
    from ap_adapter_tpu.pipeline.style_transfer import generate_style_transfer
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    cfg = PipelineConfig()
    pipe = AudioLDM2Pipeline.from_random(cfg, seed=0)
    task = get_task_config("style_transfer")

    rng = np.random.default_rng(0)
    src = rng.standard_normal(16_000 * 10).astype(np.float32) * 0.1
    pos = make_text_batch(cfg, [task.positive_text_prompts[0]] * BATCH, t5_len=64)
    neg = make_text_batch(cfg, [task.negative_text_prompts[0]] * BATCH, t5_len=64)

    kwargs = dict(
        audio_length_in_s=10.0, num_inference_steps=50,
        guidance_scale=task.guidance_scale, ap_scale=task.ap_scale,
        time_pool=task.time_pooling, freq_pool=task.freq_pooling,
    )
    generate_style_transfer(pipe, src, 16_000, pos, neg, seed=0, **kwargs)  # compile

    n = 3
    t0 = time.perf_counter()
    # serving pattern (same as bench.py): dispatch every edit without
    # blocking, then materialize all outputs — host-side prep/readback of
    # call i overlaps device compute of call i-1 (docs/PERF.md r4: SDEdit
    # device time is batch-saturated, the host residue is the flat-scaling
    # culprit)
    outs = [generate_style_transfer(pipe, src, 16_000, pos, neg, seed=i,
                                    materialize=False, **kwargs)
            for i in range(n)]
    outs = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "style_transfer_sdedit_clips_per_sec_per_chip",
        "value": round(BATCH * n / dt, 4),
        "unit": "clips/s",
        "steps_run": 50 - 50 // 4 * 2,
    }))


if __name__ == "__main__":
    main()
