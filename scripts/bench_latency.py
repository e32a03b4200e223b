"""p50 end-to-end edit latency, batch 1 — the second BASELINE.json metric.

BASELINE.json's target metric is "10 s edited clips/sec/chip at 50 DDIM
steps; p50 end-to-end edit latency". bench.py measures the first (throughput,
batch 24); this measures the second: ONE edit request, end to end on one
chip — host tokenization, host fbank DSP from a raw 16 kHz waveform,
AudioMAE + text stack, 50-step CFG DDIM denoise with the adapter active,
VAE decode, HiFi-GAN vocoding, and the device->host readback of the trimmed
waveform. Nothing is pipelined: latency is the time a single caller waits.

Reference anchor: the reference serves exactly this shape — batch 1, 50
steps (inference.py:74-78) — in eager torch on one GPU.

Config notes:
  * scan_unroll=2 — measured +5% at the batch-8 latency point (docs/PERF.md
    r3); the throughput bench keeps 1.
  * AP_LAT_ITERS / AP_LAT_BATCH env knobs for sweeps.

Prints one JSON line with p50/p90/mean seconds and the implied clips/s.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

BATCH = int(os.environ.get("AP_LAT_BATCH", "1"))
ITERS = int(os.environ.get("AP_LAT_ITERS", "12"))
STEPS = 50
SECONDS = 10.0


def main() -> None:
    import numpy as np
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    config = PipelineConfig()
    unroll = int(os.environ.get("AP_LAT_UNROLL", "2"))
    config = config.replace(
        unet=dataclasses.replace(config.unet, scan_unroll=unroll))
    pipe = AudioLDM2Pipeline.from_random(config, seed=0)

    rng = np.random.default_rng(0)
    src_wav = rng.standard_normal(
        int(SECONDS * config.fbank.sample_rate)).astype(np.float32) * 0.1

    def one_edit(seed: int) -> np.ndarray:
        # the full request path, nothing precomputed
        pos = make_text_batch(
            config, ["Trumpet, playing trumpet solo"] * BATCH, t5_len=64)
        neg = make_text_batch(config, ["low quality, noise"] * BATCH, t5_len=64)
        fb = pipe.prepare_fbank(src_wav, config.fbank.sample_rate)
        if BATCH > 1:
            import jax.numpy as jnp

            fb = jnp.broadcast_to(fb, (BATCH, *fb.shape[1:]))
        return pipe.generate(
            pos, neg, fb, audio_length_in_s=SECONDS,
            num_inference_steps=STEPS, guidance_scale=7.5, ap_scale=0.5,
            time_pool=2, freq_pool=2, seed=seed)

    one_edit(0)  # compile
    one_edit(1)  # warm

    lat = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        wav = one_edit(2 + i)
        lat.append(time.perf_counter() - t0)
        assert np.isfinite(wav).all()

    lat_s = sorted(lat)
    p50 = lat_s[len(lat_s) // 2]
    p90 = lat_s[min(len(lat_s) - 1, int(round(0.9 * (len(lat_s) - 1))))]
    print(json.dumps({
        "metric": "p50_end_to_end_edit_latency_batch%d_50_ddim_steps" % BATCH,
        "value": round(p50, 4),
        "unit": "s",
        "p90_s": round(p90, 4),
        "mean_s": round(float(np.mean(lat)), 4),
        "clips_per_s_at_batch": round(BATCH / p50, 4),
        "iters": ITERS,
        "scan_unroll": unroll,
    }))


if __name__ == "__main__":
    main()
