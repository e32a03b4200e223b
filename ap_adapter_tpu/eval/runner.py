"""Batched evaluation runner over the reference eval sets.

Drives config 4 of BASELINE.json: all 50 clips from eval_audio_in_domain/ +
eval_audio_out_of_domain/ through a task template at batch 8.

Two FAD numbers come out (run_eval_protocol), mirroring the paper's protocol
(reference README.md:5-10 eval dirs + frechet-audio-distance tooling):

- ``fad_<domain>``: generated set vs that domain's REFERENCE set — the
  paper-comparable quality number, computed per domain (in_domain /
  out_of_domain) in the CLAP-audio-tower embedding space.
- ``fad_faithfulness_<domain>``: each domain's generated set vs its own
  SOURCE clips — a secondary edit-faithfulness number (not in the paper).
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


def _embed_wavs(pipe, scorer, wavs_with_sr) -> np.ndarray:
    """[(wav, sr), ...] -> [N, D]; each clip embedded AT ITS OWN sample rate
    (a single shared sr would resample mixed-rate clips incorrectly)."""

    if scorer is not None:
        # scorer is either a ClapScorer (CLAP audio tower) or anything with
        # .embed(wavs, sr) — e.g. eval.vggish.VggishEmbedder, the
        # paper-comparable space of the reference's frechet-audio-distance
        embed = scorer.embed if hasattr(scorer, "embed") else (
            lambda wavs, sr: clap_audio_embeddings(scorer, wavs, sr))
        # group consecutive same-sr clips so same-length batches share a jit
        out, i = [], 0
        while i < len(wavs_with_sr):
            sr = wavs_with_sr[i][1]
            j = i
            while j < len(wavs_with_sr) and wavs_with_sr[j][1] == sr:
                j += 1
            out.append(embed([w for w, _ in wavs_with_sr[i:j]], sr))
            i = j
        return np.concatenate(out)
    return np.stack([audiomae_clip_embedding(pipe, w, sr) for w, sr in wavs_with_sr])


def _space_name(scorer) -> str:
    """Suffix for the fad_* result keys ("clap" keeps the r2/r3 key name)."""

    if scorer is None:
        return "audiomae"
    return "vggish" if hasattr(scorer, "embed") else "clap"


def run_batched_eval(
    pipe: AudioLDM2Pipeline,
    clip_paths: List[str],
    task: TaskConfig,
    batch_size: int = 8,
    tokenizers=None,
    compute_fad: bool = True,
    output_dir: Optional[str] = None,
    scorer=None,
    return_embeddings: bool = False,
):
    """Edit every clip (prompt = task's first positive prompt); returns
    {clips_per_s, fad, n} and optionally writes the edited wavs.

    FAD embedding space: the CLAP audio tower when ``scorer`` (a
    eval.clap_scoring.ClapScorer) is given — the standard, checkpoint-
    anchored space — else the AudioMAE fallback. The in-function FAD is the
    SOURCE-vs-EDIT faithfulness number; the paper-comparable generated-vs-
    reference-set protocol lives in ``run_eval_protocol``. FAD embedding and
    wav-writing happen OUTSIDE the timed window. Throughput is the sustained
    pipelined rate: batches are dispatched with ``materialize=False`` so
    per-clip fbank prep and readback overlap device compute, and the clock
    spans dispatch of batch 2 (batch 1 pays the compile) through
    materialization of the last output.

    ``return_embeddings``: also return (src_embeds, gen_embeds) [N, D] for
    cross-set aggregation.
    """

    cfg = pipe.config
    prompt = task.positive_text_prompts[0]
    neg = task.negative_text_prompts[0] if task.negative_text_prompts else ""
    pos_b = make_text_batch(cfg, [prompt] * batch_size, tokenizers)
    neg_b = make_text_batch(cfg, [neg] * batch_size, tokenizers)

    src_wavs, all_edits, all_names = [], [], []
    n_done = 0
    wall = 0.0
    samples = int(task.audio_length_in_s * cfg.vocoder.sampling_rate)
    gen_kwargs = dict(
        audio_length_in_s=task.audio_length_in_s,
        num_inference_steps=task.num_inference_steps,
        guidance_scale=task.guidance_scale,
        ap_scale=task.ap_scale,
        time_pool=task.time_pooling,
        freq_pool=task.freq_pooling,
    )
    # pipelined sweep (same serving pattern as bench.py / SDEdit, PERF.md
    # r4): dispatch every batch with materialize=False so each batch's host
    # work — per-clip fbank DSP, output readback — overlaps the previous
    # batch's device compute. The pipeline is 1 batch deep: batch i-1 is
    # materialized while batch i runs on device, so output HBM stays O(1)
    # in the sweep length (an all-lazy sweep pins every batch's waveforms
    # on device and can OOM at large eval sets) with the same host/device
    # overlap. The first (compile) batch is materialized before the clock
    # starts; the timed window spans dispatch of batch 2 through
    # materialization of the last output.
    t0 = None
    in_flight = None
    n_timed = 0
    for i in range(0, len(clip_paths) - batch_size + 1, batch_size):
        batch_paths = clip_paths[i : i + batch_size]
        fbanks = []
        for p in batch_paths:
            wav, sr = load_wav(p)
            fbanks.append(np.asarray(pipe.prepare_fbank(wav, sr))[0])
            if compute_fad:
                src_wavs.append((wav, sr))
        fbank = np.stack(fbanks)

        wavs = pipe.generate(pos_b, neg_b, fbank, seed=i,
                             materialize=False, **gen_kwargs)
        if n_done == 0:  # compile batch: materialize now, untimed
            all_edits.append(np.asarray(wavs)[:, :samples])
            t0 = time.perf_counter()
        else:
            if in_flight is not None:
                all_edits.append(np.asarray(in_flight)[:, :samples])
            in_flight = wavs
            n_timed += batch_size
        all_names.extend(os.path.basename(p) for p in batch_paths)
        n_done += batch_size
    if in_flight is not None:
        all_edits.append(np.asarray(in_flight)[:, :samples])
    if t0 is not None and n_timed:
        wall = time.perf_counter() - t0

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
    src_e = gen_e = None
    if compute_fad and n_done > 1:
        src_e = _embed_wavs(pipe, scorer, src_wavs)
        gen_e = _embed_wavs(
            pipe, scorer, [(w, sr_out) for batch in all_edits for w in batch])
        result[f"fad_{_space_name(scorer)}"] = fad(src_e, gen_e)
    if return_embeddings:
        return result, src_e, gen_e
    return result


def run_eval_protocol(
    pipe,
    domains: dict,
    task: TaskConfig,
    batch_size: int = 8,
    tokenizers=None,
    output_dir: Optional[str] = None,
    scorer=None,
):
    """The paper's FAD protocol over the reference eval sets.

    ``domains``: {name: {"source": [dirs], "reference": [dirs]}}. Per
    domain, every SOURCE clip is edited with the task template, then:

    - ``fad_<name>``: FAD(REFERENCE-set embeds, generated embeds) — the
      paper-comparable quality number. The reference set is the real-
      recording distribution the edits should land in (the in-domain set
      for timbre transfer, regardless of where the sources came from) —
      NOT automatically the source set.
    - ``fad_faithfulness_<name>``: FAD(source embeds, generated embeds) —
      the secondary source-vs-edit number (how far the edit strayed).
    - overall ``clips_per_s`` across domains.

    Reference: README.md:5-10 (eval dirs), pipeline_audioldm2.py:592-614
    (CLAP machinery); embedding space is the CLAP audio tower when
    ``scorer`` is given.
    """

    space = _space_name(scorer)
    out = {"embedding_space": {"clap": "clap_audio"}.get(space, space),
           "task": getattr(task, "name", None) or "custom"}
    total_clips, wall_rates = 0, []
    for name, spec in domains.items():
        clips = eval_clips(spec["source"])
        if not clips:
            continue
        dom_out = os.path.join(output_dir, name) if output_dir else None
        res, src_e, gen_e = run_batched_eval(
            pipe, clips, task, batch_size=batch_size, tokenizers=tokenizers,
            compute_fad=True, output_dir=dom_out, scorer=scorer,
            return_embeddings=True,
        )
        if gen_e is not None:
            ref_paths = eval_clips(spec.get("reference", spec["source"]))
            if ref_paths == clips:  # reference set == source set: reuse embeds
                ref_e = src_e
            else:
                ref_wavs = [load_wav(p) for p in ref_paths]
                ref_e = _embed_wavs(pipe, scorer, ref_wavs)
            out[f"fad_{name}"] = fad(ref_e, gen_e)
            out[f"fad_faithfulness_{name}"] = res.get(f"fad_{_space_name(scorer)}")
        out[f"n_{name}"] = res["n"]
        total_clips += res["n"]
        if np.isfinite(res["clips_per_s"]):
            wall_rates.append(res["clips_per_s"])
    out["n_total"] = total_clips
    if wall_rates:
        out["clips_per_s"] = float(np.mean(wall_rates))
    return out


def main(argv=None):
    """CLI: batched eval over the reference eval sets (BASELINE config 4)."""

    import argparse
    import json

    from ap_adapter_tpu.configs import PipelineConfig, get_task_config
    from ap_adapter_tpu.pipeline.tasks import load_pipeline

    p = argparse.ArgumentParser(description="batched eval sweep")
    p.add_argument("--clip-dirs", nargs="+", default=None,
                   help="flat sweep over these dirs (throughput + "
                        "faithfulness FAD only)")
    p.add_argument("--in-domain-dirs", nargs="+", default=None,
                   help="protocol mode: in-domain source+reference set "
                        "(e.g. eval_audio_in_domain)")
    p.add_argument("--out-of-domain-dirs", nargs="+", default=None,
                   help="protocol mode: out-of-domain source set; its "
                        "reference set defaults to --in-domain-dirs")
    p.add_argument("--task", default="timbre_transfer")
    p.add_argument("--checkpoint-dir", default="", help="converted checkpoint dir")
    p.add_argument("--adapter-ckpt", default="")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--output-dir", default="")
    p.add_argument("--no-fad", action="store_true")
    p.add_argument("--vggish-ckpt", default="", help="torchvggish .pt state "
                   "dict: compute FAD in the paper's VGGish space instead of "
                   "the CLAP audio tower (eval/vggish.py)")
    args = p.parse_args(argv)

    config = PipelineConfig()
    pipe = load_pipeline(config, checkpoint_dir=args.checkpoint_dir or None,
                         adapter_ckpt=args.adapter_ckpt or None)
    task = get_task_config(args.task, num_inference_steps=args.steps)

    scorer = None
    if args.vggish_ckpt:
        from ap_adapter_tpu.eval.vggish import VggishEmbedder

        scorer = VggishEmbedder.from_torch_checkpoint(args.vggish_ckpt)
    elif args.checkpoint_dir and os.path.exists(
        os.path.join(args.checkpoint_dir, "clap_audio.msgpack")
    ):
        from ap_adapter_tpu.configs import ClapAudioConfig
        from ap_adapter_tpu.eval.clap_scoring import ClapScorer
        from ap_adapter_tpu.utils.checkpoint import load_params

        loaded = load_params(args.checkpoint_dir, names=["clap", "clap_audio"])
        scorer = ClapScorer(config.clap, ClapAudioConfig(),
                            {"text": loaded["clap"], "audio": loaded["clap_audio"]})

    if args.in_domain_dirs:
        domains = {"in_domain": {"source": args.in_domain_dirs,
                                 "reference": args.in_domain_dirs}}
        if args.out_of_domain_dirs:
            domains["out_of_domain"] = {"source": args.out_of_domain_dirs,
                                        "reference": args.in_domain_dirs}
        result = run_eval_protocol(
            pipe, domains, task, batch_size=args.batch_size,
            output_dir=args.output_dir or None, scorer=scorer,
        )
    else:
        if not args.clip_dirs:
            p.error("pass --in-domain-dirs (protocol) or --clip-dirs (sweep)")
        result = run_batched_eval(
            pipe, eval_clips(args.clip_dirs), task, batch_size=args.batch_size,
            compute_fad=not args.no_fad, output_dir=args.output_dir or None,
            scorer=scorer,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
