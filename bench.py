"""Benchmark: 10 s edited clips/sec/chip at 50 DDIM steps (BASELINE.json).

Runs the full jitted edit pipeline — AudioMAE conditioning, CLAP/T5/GPT-2
text stack, 50-step CFG DDIM scan over the audioldm2-large UNet with the
audio adapter active, VAE decode, HiFi-GAN vocoding — on one TPU chip in
bf16 with random weights (identical FLOPs/shapes to checkpointed inference;
no HF downloads are possible in this environment).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numbers (BASELINE.md); the A100
fp16 PyTorch estimate for this workload is ~0.25 clips/sec (50 UNet steps x
2 CFG at ~350M-param UNet, plus conditioning + vocoder). vs_baseline uses
that estimate until a measured reference lands in BASELINE.md.
"""

from __future__ import annotations

import json
import time

import os as _os

A100_BASELINE_CLIPS_PER_S = 0.25
# throughput metric: batch amortizes fixed per-step work; measured r2 on one
# v5e chip: batch 8 -> 2.09, 16 -> 2.20, 24 -> 2.24 clips/s
BATCH = int(_os.environ.get("AP_BENCH_BATCH", "24"))
STEPS = 50
SECONDS = 10.0


def main() -> None:
    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    config = PipelineConfig()
    if _os.environ.get("AP_USE_PALLAS_GN") == "1":  # A/B the fused GN kernel
        import dataclasses

        config = config.replace(
            unet=dataclasses.replace(config.unet, use_pallas_groupnorm=True))
    if _os.environ.get("AP_INT8", "0") == "1":  # A/B the int8 serving mode
        import dataclasses

        config = config.replace(
            unet=dataclasses.replace(config.unet, use_int8=True))
    if _os.environ.get("AP_USE_PALLAS_RESNET", "0") == "1":  # A/B: =1 enables
        # measured 2.156 vs 2.227 clips/s at batch 24 (docs/PERF.md r3):
        # the fused resnet block kernel loses ~3% in-pipeline — default off
        import dataclasses

        config = config.replace(
            unet=dataclasses.replace(config.unet, use_pallas_resnet=True))
    pipe = AudioLDM2Pipeline.from_random(config, seed=0)

    prompts = ["Trumpet, playing trumpet solo"] * BATCH
    neg = ["low quality, noise"] * BATCH
    pos_batch = make_text_batch(config, prompts, t5_len=64)
    neg_batch = make_text_batch(config, neg, t5_len=64)

    rng = np.random.default_rng(0)
    fbank = jnp.asarray(
        rng.standard_normal((BATCH, *config.audiomae.img_size)).astype(np.float32)
    )

    kwargs = dict(
        audio_length_in_s=SECONDS,
        num_inference_steps=STEPS,
        guidance_scale=7.5,
        ap_scale=0.5,
        time_pool=2,
        freq_pool=2,
    )

    # warmup / compile
    pipe.generate(pos_batch, neg_batch, fbank, seed=0, **kwargs)

    # serving pattern: dispatch every call, materialize all outputs at the
    # end (inside the timed region — all work is forced). Host-side work of
    # call i+1 (arg marshaling, small transfers) overlaps call i's device
    # compute instead of serializing behind the output readback.
    n_iters = 3
    t0 = time.perf_counter()
    wavs = [
        pipe.generate(pos_batch, neg_batch, fbank, seed=i, materialize=False, **kwargs)
        for i in range(n_iters)
    ]
    for wav in wavs:
        np.asarray(wav)
    dt = time.perf_counter() - t0

    clips_per_s = (BATCH * n_iters) / dt
    print(
        json.dumps(
            {
                "metric": "10s_edited_clips_per_sec_per_chip_50_ddim_steps",
                "value": round(clips_per_s, 4),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_s / A100_BASELINE_CLIPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
