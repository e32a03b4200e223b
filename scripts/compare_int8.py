"""End-to-end numerics: int8 (W8A8) serving mode vs the bf16 pipeline.

Runs the full edit pipeline twice on identical inputs/seed — once bf16,
once with UNetConfig.use_int8 — and compares the output waveforms in
log-mel space (the representation PARITY.md's end-to-end tolerance row is
written in: 50-step composition is judged on spectra, not bits).

Both executables hit the persistent compile cache when bench.py and
`AP_INT8=1 bench.py` have run at the same batch (default 24).

Usage (real TPU): python scripts/compare_int8.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("AP_BENCH_BATCH", "24"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ap_adapter_tpu.audio.mel import tacotron_mel
    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    config = PipelineConfig()
    prompts = ["Trumpet, playing trumpet solo"] * BATCH
    neg = ["low quality, noise"] * BATCH
    pos_batch = make_text_batch(config, prompts, t5_len=64)
    neg_batch = make_text_batch(config, neg, t5_len=64)
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(
        rng.standard_normal((BATCH, *config.audiomae.img_size)).astype(np.float32))
    kwargs = dict(audio_length_in_s=10.0, num_inference_steps=50,
                  guidance_scale=7.5, ap_scale=0.5, time_pool=2, freq_pool=2)

    wavs = {}
    for name, cfg in (
        ("bf16", config),
        ("int8", config.replace(unet=dataclasses.replace(config.unet, use_int8=True))),
    ):
        pipe = AudioLDM2Pipeline.from_random(cfg, seed=0)
        wavs[name] = np.asarray(
            pipe.generate(pos_batch, neg_batch, fbank, seed=0, **kwargs))
        del pipe

    mels = {k: np.asarray(tacotron_mel(jnp.asarray(v), config.mel))
            for k, v in wavs.items()}
    a, b = mels["int8"].ravel(), mels["bf16"].ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    mad = float(np.mean(np.abs(a - b)))
    # per-clip cosine: catches a single broken clip that the pooled stat hides
    pc = [float(np.dot(x.ravel(), y.ravel())
                / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-9))
          for x, y in zip(mels["int8"], mels["bf16"])]
    print(json.dumps({
        "batch": BATCH,
        "logmel_cosine": round(cos, 5),
        "logmel_mean_abs_diff": round(mad, 5),
        "per_clip_cosine_min": round(min(pc), 5),
        "wav_rel_err": round(float(
            np.linalg.norm(wavs["int8"] - wavs["bf16"])
            / np.linalg.norm(wavs["bf16"])), 5),
    }))


if __name__ == "__main__":
    main()
