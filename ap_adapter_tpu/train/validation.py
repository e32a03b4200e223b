"""Default validation sampling during training.

Mirrors the reference ``log_validation`` (train_apadapter_v2.py:483-528):
every ``validation_steps`` pick a random training clip + AudioSet caption
template, run the full inference pipeline at a random pooling rate with the
CURRENT adapter weights, and write the generated wav (plus the conditioning
original) under ``<output_dir>/validation/`` for A/B listening.
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, Optional

import jax
import numpy as np

from ap_adapter_tpu.audio.fbank import audiomae_fbank
from ap_adapter_tpu.audio.io import save_wav
from ap_adapter_tpu.pipeline.pipeline import PipelineModules, cast_params_to
from ap_adapter_tpu.pipeline.tokenize import make_text_batch
from ap_adapter_tpu.train.data import POOL_CHOICES


def make_validation_fn(
    modules: PipelineModules,
    params: Dict[str, Any],
    dataset,
    output_dir: str,
    tokenizers=None,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    ap_scale: float = 0.5,
    audio_length_in_s: float = 10.0,
    seed: int = 0,
    negative_prompt: str = "low quality, average quality",
    num_files: int = 1,
):
    """Build a ``validation_fn(step, unet_params)`` for train.loop.train().

    ``dataset`` is any indexable yielding (caption, waveform_16k) pairs
    (e.g. train.data.AudioSetDataset). The generate call reuses one jitted
    executable per pooling rate across validation rounds.

    ``num_files`` clips are sampled per round and generated as ONE batched
    call at a shared pooling rate (reference --num_validation_audio_files,
    train_apadapter_v2.py:193,515 — there a Python loop of single-clip
    generations; batching keeps one executable per (pool, N) on TPU).
    """

    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline

    cfg = modules.config
    val_dir = os.path.join(output_dir, "validation")
    os.makedirs(val_dir, exist_ok=True)
    rng = random.Random(seed)
    pipe = AudioLDM2Pipeline(cfg, {})  # params swapped in per call
    frozen = {k: v for k, v in params.items() if k != "unet"}

    def validation_fn(step: int, unet_params: Dict[str, Any]) -> str:
        n = max(1, min(num_files, len(dataset)))
        picks = [dataset[rng.randrange(len(dataset))] for _ in range(n)]
        captions = [c for c, _ in picks]
        # random pooling rate, restricted to what the encoder grid divides
        # evenly (full scale: 64x8 grid -> all of {1,2,4,8} as the reference)
        gt, gf = cfg.audiomae.grid_size
        pool = rng.choice([p for p in POOL_CHOICES if gt % p == 0 and gf % p == 0])

        fbank = audiomae_fbank(
            np.stack([np.asarray(w, np.float32) for _, w in picks]), cfg.fbank)
        # crop/pad to the encoder's grid (a no-op at full scale, where the
        # fbank target IS (1024, 128); tiny test configs use smaller grids)
        t, f = cfg.audiomae.img_size
        fbank = fbank[:, :t, :f]
        if fbank.shape[1] < t or fbank.shape[2] < f:
            fbank = np.pad(np.asarray(fbank),
                           ((0, 0), (0, t - fbank.shape[1]), (0, f - fbank.shape[2])))
        text_pos = make_text_batch(cfg, captions, tokenizers)
        text_neg = make_text_batch(cfg, [negative_prompt] * n, tokenizers)

        pipe.params = dict(frozen, unet=cast_params_to(unet_params, cfg.dtype))
        out = pipe.generate(
            text_pos, text_neg, fbank,
            audio_length_in_s=audio_length_in_s,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            ap_scale=ap_scale,
            time_pool=pool, freq_pool=pool,
            seed=rng.randrange(2**31),
        )
        sr = cfg.vocoder.sampling_rate
        path = os.path.join(val_dir, f"step{step}_pool{pool}.wav")
        for i in range(n):
            suffix = "" if i == 0 else f"_{i}"
            save_wav(os.path.join(val_dir, f"step{step}_pool{pool}{suffix}.wav"),
                     out[i], sr)
            save_wav(os.path.join(val_dir, f"step{step}_original{suffix}.wav"),
                     np.asarray(picks[i][1]), sr)
        with open(os.path.join(val_dir, f"step{step}_caption.txt"), "w") as f:
            f.write("\n".join(captions) + f"\n(pool={pool})\n")
        return path

    return validation_fn
