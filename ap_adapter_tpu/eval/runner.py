"""Batched evaluation runner over the reference eval sets.

Drives config 4 of BASELINE.json: all 50 clips from eval_audio_in_domain/ +
eval_audio_out_of_domain/ through a task template at batch 8, reporting
throughput and FAD between sources and edits.
"""

from __future__ import annotations

import glob
import os
import time
from typing import List, Optional

import numpy as np

from ap_adapter_tpu.audio.io import load_wav
from ap_adapter_tpu.configs import TaskConfig
from ap_adapter_tpu.eval.metrics import audiomae_clip_embedding, fad
from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
from ap_adapter_tpu.pipeline.tokenize import make_text_batch


def eval_clips(dirs: List[str]) -> List[str]:
    paths: List[str] = []
    for d in dirs:
        paths.extend(sorted(glob.glob(os.path.join(d, "*.wav"))))
    return paths


def run_batched_eval(
    pipe: AudioLDM2Pipeline,
    clip_paths: List[str],
    task: TaskConfig,
    batch_size: int = 8,
    tokenizers=None,
    compute_fad: bool = True,
    output_dir: Optional[str] = None,
):
    """Edit every clip (prompt = task's first positive prompt); returns
    {clips_per_s, fad, n} and optionally writes the edited wavs."""

    cfg = pipe.config
    prompt = task.positive_text_prompts[0]
    neg = task.negative_text_prompts[0] if task.negative_text_prompts else ""
    pos_b = make_text_batch(cfg, [prompt] * batch_size, tokenizers)
    neg_b = make_text_batch(cfg, [neg] * batch_size, tokenizers)

    src_embeds, gen_embeds = [], []
    n_done = 0
    wall = 0.0
    for i in range(0, len(clip_paths) - batch_size + 1, batch_size):
        batch_paths = clip_paths[i : i + batch_size]
        fbanks = []
        for p in batch_paths:
            wav, sr = load_wav(p)
            fbanks.append(np.asarray(pipe.prepare_fbank(wav, sr))[0])
            if compute_fad:
                src_embeds.append(audiomae_clip_embedding(pipe, wav, sr))
        fbank = np.stack(fbanks)

        t0 = time.perf_counter()
        wavs = pipe.generate(
            pos_b, neg_b, fbank,
            audio_length_in_s=task.audio_length_in_s,
            num_inference_steps=task.num_inference_steps,
            guidance_scale=task.guidance_scale,
            ap_scale=task.ap_scale,
            time_pool=task.time_pooling,
            freq_pool=task.freq_pooling,
            seed=i,
        )
        if n_done > 0:  # skip the compile batch in throughput
            wall += time.perf_counter() - t0
        for j, w in enumerate(wavs):
            if compute_fad:
                gen_embeds.append(audiomae_clip_embedding(pipe, w, cfg.vocoder.sampling_rate))
            if output_dir:
                from ap_adapter_tpu.audio.io import save_wav

                os.makedirs(output_dir, exist_ok=True)
                name = os.path.basename(batch_paths[j]).replace(".wav", "_edit.wav")
                save_wav(os.path.join(output_dir, name), w, cfg.vocoder.sampling_rate)
        n_done += batch_size

    result = {
        "n": n_done,
        "clips_per_s": (n_done - batch_size) / wall if wall > 0 else float("nan"),
    }
    if compute_fad and len(src_embeds) > 1:
        result["fad_audiomae"] = fad(np.stack(src_embeds), np.stack(gen_embeds))
    return result
