"""Task-level API + CLI: timbre transfer, style transfer, accompaniment.

Mirrors the reference entry point ``python inference.py --task <task>``
(inference.py:85-91 + config.py task templates): loads the pipeline, loads
the flat adapter checkpoint, loops prompts, writes 16 kHz wavs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ap_adapter_tpu.configs import PipelineConfig, TaskConfig, get_task_config
from ap_adapter_tpu.adapter.params import import_flat_adapter
from ap_adapter_tpu.audio.io import load_wav, save_wav
from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
from ap_adapter_tpu.pipeline.tokenize import HFTokenizers, make_text_batch


def load_pipeline(
    config: PipelineConfig,
    checkpoint_dir: Optional[str] = None,
    adapter_ckpt: Optional[str] = None,
    seed: int = 0,
    tensor_parallel: int = 1,
) -> AudioLDM2Pipeline:
    """Build the pipeline from a converted checkpoint directory (or random
    weights when none is given — benchmarking/smoke mode).

    ``tensor_parallel`` > 1 builds a (devices/N, N) mesh and serves each
    request cooperatively over N chips (parallel/tp.py latency mode)."""

    mesh = None
    kw = {}
    if tensor_parallel > 1:
        import jax

        from ap_adapter_tpu.parallel import mesh as mesh_lib

        # latency mode: exactly N chips serve each request cooperatively
        # (data axis 1 — any request batch size works); a production server
        # runs one such replica per N-chip group
        mesh = mesh_lib.create_mesh(
            data=1, model=tensor_parallel,
            devices=jax.devices()[:tensor_parallel])
        kw = dict(mesh=mesh, tensor_parallel=True)

    if checkpoint_dir:
        from ap_adapter_tpu.utils.checkpoint import load_params

        params = load_params(checkpoint_dir)
        pipe = AudioLDM2Pipeline(config, params, **kw)
    elif mesh is not None:
        from ap_adapter_tpu.pipeline.pipeline import PipelineModules, cast_params_to

        params = cast_params_to(PipelineModules(config).init_params(seed),
                                config.dtype)
        pipe = AudioLDM2Pipeline(config, params, **kw)
    else:
        pipe = AudioLDM2Pipeline.from_random(config, seed)

    if adapter_ckpt:
        flat = _load_flat_adapter(adapter_ckpt)
        pipe.params["unet"] = import_flat_adapter(pipe.params["unet"], flat, config.unet)
        if mesh is not None:
            # the imported adapter leaves are host arrays; recommit the tree
            # so every leaf carries its 'model' sharding before the first jit
            from ap_adapter_tpu.parallel import tp as tp_lib

            pipe.params = tp_lib.tp_place_params(
                mesh, pipe.params, config.unet.num_attention_heads)
    return pipe


def _load_flat_adapter(path: str):
    """Flat adapter dict from .npz (ours) or torch .bin (reference format)."""

    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # torch CPU is only needed for reference-format checkpoints

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def run_task(
    task: TaskConfig,
    pipe: AudioLDM2Pipeline,
    tokenizers: Optional[HFTokenizers] = None,
) -> list[str]:
    """Execute one task template; returns the written wav paths
    (mirrors inference.py:67-81 including the file naming scheme)."""

    os.makedirs(task.output_dir, exist_ok=True)
    cfg = pipe.config

    fbank = None
    if task.audio_prompt_file:
        wav, sr = load_wav(task.audio_prompt_file)
        fbank = pipe.prepare_fbank(wav, sr)

    written = []
    for prompt in task.positive_text_prompts:
        pos = make_text_batch(cfg, [prompt] * task.num_files, tokenizers)
        neg_prompt = task.negative_text_prompts[0] if task.negative_text_prompts else ""
        neg = make_text_batch(cfg, [neg_prompt] * task.num_files, tokenizers)
        fb = None
        if fbank is not None:
            fb = np.broadcast_to(np.asarray(fbank), (task.num_files, *fbank.shape[1:]))

        wavs = pipe.generate(
            pos, neg, fb if fb is None else np.ascontiguousarray(fb),
            audio_length_in_s=task.audio_length_in_s,
            num_inference_steps=task.num_inference_steps,
            guidance_scale=task.guidance_scale,
            ap_scale=task.ap_scale,
            time_pool=task.time_pooling,
            freq_pool=task.freq_pooling,
        )
        for j in range(task.num_files):
            name = (
                f"{prompt[0]}_{j}_ip{task.ap_scale}"
                f"_t{task.time_pooling}_f{task.freq_pooling}.wav"
            )
            path = os.path.join(task.output_dir, name)
            save_wav(path, wavs[j], cfg.vocoder.sampling_rate)
            written.append(path)
    return written


def run_sdedit_task(
    task: TaskConfig,
    pipe: AudioLDM2Pipeline,
    tokenizers: Optional[HFTokenizers] = None,
) -> list[str]:
    """SDEdit route for style transfer (reference
    style_transfer_pipeline.py:905-981, dead code in the reference's own
    CLI; here it is the flagship truncated-schedule path,
    pipeline/style_transfer.py): source wav -> VAE latent noised to
    mid-schedule -> truncated DDIM tail -> trimmed wavs, same file-naming
    scheme as run_task."""

    from ap_adapter_tpu.pipeline.style_transfer import generate_style_transfer

    if not task.audio_prompt_file:
        raise ValueError("--sdedit requires --audio-prompt (the source clip "
                         "whose latent seeds the truncated schedule)")
    os.makedirs(task.output_dir, exist_ok=True)
    cfg = pipe.config
    wav, sr = load_wav(task.audio_prompt_file)

    written = []
    for prompt in task.positive_text_prompts:
        pos = make_text_batch(cfg, [prompt] * task.num_files, tokenizers)
        neg_prompt = task.negative_text_prompts[0] if task.negative_text_prompts else ""
        neg = make_text_batch(cfg, [neg_prompt] * task.num_files, tokenizers)
        wavs = generate_style_transfer(
            pipe, wav, sr, pos, neg,
            audio_length_in_s=task.audio_length_in_s,
            num_inference_steps=task.num_inference_steps,
            guidance_scale=task.guidance_scale,
            ap_scale=task.ap_scale,
            time_pool=task.time_pooling,
            freq_pool=task.freq_pooling,
        )
        for j in range(task.num_files):
            name = (
                f"{prompt[0]}_{j}_ip{task.ap_scale}"
                f"_t{task.time_pooling}_f{task.freq_pooling}_sdedit.wav"
            )
            path = os.path.join(task.output_dir, name)
            save_wav(path, wavs[j], cfg.vocoder.sampling_rate)
            written.append(path)
    return written


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="AP-adapter TPU inference")
    parser.add_argument("--task", default="timbre_transfer",
                        choices=["timbre_transfer", "style_transfer",
                                 "accompaniment_generation", "test"])
    parser.add_argument("--audio-prompt", default="", help="reference wav file")
    parser.add_argument("--checkpoint-dir", default="", help="converted checkpoint dir")
    parser.add_argument("--adapter-ckpt", default="", help="flat adapter ckpt (.npz or .bin)")
    parser.add_argument("--output-dir", default="output")
    parser.add_argument("--num-files", type=int, default=1)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--random-weights", action="store_true",
                        help="run with random weights (smoke/benchmark)")
    parser.add_argument("--sdedit", action="store_true",
                        help="style_transfer only: edit via the SDEdit "
                        "truncated-schedule path (source latent noised to "
                        "mid-schedule) instead of full text-to-audio "
                        "generation; requires --audio-prompt")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny smoke config instead of the full model "
                        "(CI / CPU smoke runs)")
    parser.add_argument("--audio-length", type=float, default=None,
                        help="output length in seconds (default: task template)")
    parser.add_argument("--prompt", default="",
                        help="override the task template's prompt list with "
                        "this single positive prompt")
    parser.add_argument("--time-pool", type=int, default=None,
                        help="override the task template's time pooling")
    parser.add_argument("--freq-pool", type=int, default=None,
                        help="override the task template's freq pooling")
    parser.add_argument("--tensor-parallel", type=int, default=1,
                        help="serve each request over N chips (model-axis "
                        "sharded UNet, parallel/tp.py latency mode; N must "
                        "divide both the device and attention-head counts)")
    args = parser.parse_args(argv)

    if args.sdedit and args.task != "style_transfer":
        parser.error("--sdedit is only valid with --task style_transfer")

    overrides = {}
    if args.audio_length is not None:
        overrides["audio_length_in_s"] = args.audio_length
    if args.prompt:
        overrides["positive_text_prompts"] = (args.prompt,)
    if args.time_pool is not None:
        overrides["time_pooling"] = args.time_pool
    if args.freq_pool is not None:
        overrides["freq_pooling"] = args.freq_pool
    task = get_task_config(
        args.task, output_dir=args.output_dir, audio_prompt_file=args.audio_prompt,
        adapter_ckpt=args.adapter_ckpt, num_files=args.num_files,
        num_inference_steps=args.steps, **overrides,
    )
    if args.tiny:
        from ap_adapter_tpu.configs import tiny_pipeline_config

        config = tiny_pipeline_config()
    else:
        config = PipelineConfig()
    pipe = load_pipeline(
        config,
        checkpoint_dir=args.checkpoint_dir or None,
        adapter_ckpt=args.adapter_ckpt or None,
        tensor_parallel=args.tensor_parallel,
    )
    tokenizers = None
    if args.checkpoint_dir and os.path.isdir(os.path.join(args.checkpoint_dir, "tokenizer")):
        tokenizers = HFTokenizers(args.checkpoint_dir)
    runner = run_sdedit_task if args.sdedit else run_task
    paths = runner(task, pipe, tokenizers)
    for p in paths:
        print(p)


if __name__ == "__main__":
    main()
