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
from ap_adapter_tpu.eval.metrics import audiomae_clip_embedding, clap_audio_embeddings, fad
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
    scorer=None,
):
    """Edit every clip (prompt = task's first positive prompt); returns
    {clips_per_s, fad, n} and optionally writes the edited wavs.

    FAD embedding space: the CLAP audio tower when ``scorer`` (a
    eval.clap_scoring.ClapScorer) is given — the standard, checkpoint-
    anchored space — else the AudioMAE fallback. All embedding and IO work
    happens OUTSIDE the timed window; throughput times generate() only,
    excluding the first (compile) batch.
    """

    cfg = pipe.config
    prompt = task.positive_text_prompts[0]
    neg = task.negative_text_prompts[0] if task.negative_text_prompts else ""
    pos_b = make_text_batch(cfg, [prompt] * batch_size, tokenizers)
    neg_b = make_text_batch(cfg, [neg] * batch_size, tokenizers)

    src_wavs, all_edits, all_names = [], [], []
    n_done = 0
    wall = 0.0
    for i in range(0, len(clip_paths) - batch_size + 1, batch_size):
        batch_paths = clip_paths[i : i + batch_size]
        fbanks = []
        for p in batch_paths:
            wav, sr = load_wav(p)
            fbanks.append(np.asarray(pipe.prepare_fbank(wav, sr))[0])
            if compute_fad:
                src_wavs.append((wav, sr))
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
        all_edits.append(wavs)
        all_names.extend(os.path.basename(p) for p in batch_paths)
        n_done += batch_size

    sr_out = cfg.vocoder.sampling_rate
    if output_dir:
        from ap_adapter_tpu.audio.io import save_wav

        os.makedirs(output_dir, exist_ok=True)
        for name, w in zip(all_names, (w for batch in all_edits for w in batch)):
            save_wav(os.path.join(output_dir, name.replace(".wav", "_edit.wav")), w, sr_out)

    result = {
        "n": n_done,
        "clips_per_s": (n_done - batch_size) / wall if wall > 0 else float("nan"),
    }
    if compute_fad and n_done > 1:
        if scorer is not None:
            src_e = clap_audio_embeddings(scorer, [w for w, _ in src_wavs], src_wavs[0][1])
            gen_e = np.concatenate(
                [clap_audio_embeddings(scorer, batch, sr_out) for batch in all_edits]
            )
            result["fad_clap"] = fad(src_e, gen_e)
        else:
            src_e = np.stack([audiomae_clip_embedding(pipe, w, sr) for w, sr in src_wavs])
            gen_e = np.stack([
                audiomae_clip_embedding(pipe, w, sr_out)
                for batch in all_edits for w in batch
            ])
            result["fad_audiomae"] = fad(src_e, gen_e)
    return result


def main(argv=None):
    """CLI: batched eval over the reference eval sets (BASELINE config 4)."""

    import argparse
    import json

    from ap_adapter_tpu.configs import PipelineConfig, get_task_config
    from ap_adapter_tpu.pipeline.tasks import load_pipeline

    p = argparse.ArgumentParser(description="batched eval sweep")
    p.add_argument("--clip-dirs", nargs="+", required=True,
                   help="e.g. eval_audio_in_domain eval_audio_out_of_domain")
    p.add_argument("--task", default="timbre_transfer")
    p.add_argument("--checkpoint-dir", default="", help="converted checkpoint dir")
    p.add_argument("--adapter-ckpt", default="")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--output-dir", default="")
    p.add_argument("--no-fad", action="store_true")
    args = p.parse_args(argv)

    config = PipelineConfig()
    pipe = load_pipeline(config, checkpoint_dir=args.checkpoint_dir or None,
                         adapter_ckpt=args.adapter_ckpt or None)
    task = get_task_config(args.task, num_inference_steps=args.steps)

    scorer = None
    if args.checkpoint_dir and os.path.exists(
        os.path.join(args.checkpoint_dir, "clap_audio.msgpack")
    ):
        from ap_adapter_tpu.configs import ClapAudioConfig
        from ap_adapter_tpu.eval.clap_scoring import ClapScorer
        from ap_adapter_tpu.utils.checkpoint import load_params

        loaded = load_params(args.checkpoint_dir, names=["clap", "clap_audio"])
        scorer = ClapScorer(config.clap, ClapAudioConfig(),
                            {"text": loaded["clap"], "audio": loaded["clap_audio"]})

    result = run_batched_eval(
        pipe, eval_clips(args.clip_dirs), task, batch_size=args.batch_size,
        compute_fad=not args.no_fad, output_dir=args.output_dir or None,
        scorer=scorer,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
