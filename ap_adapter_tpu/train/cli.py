"""Training CLI mirroring the reference launchers (train.sh / finetune.sh).

    python -m ap_adapter_tpu.train.cli \
        --train-manifest $DATA_DIR/manifest.json \
        --checkpoint-dir /path/to/converted \
        --output-dir $OUTPUT_DIR \
        --train-batch-size 8 --gradient-accumulation-steps 4 \
        --learning-rate 1e-4 --max-train-steps 35000

Resume from a flat adapter checkpoint with --resume-from-checkpoint
(reference finetune.sh); without it the adapter is zero-delta initialized by
copying each site's frozen to_k/to_v (reference copy_weight.py +
copied_cross_attention/).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="AP-adapter TPU finetuning")
    p.add_argument("--train-manifest", required=True, help="AudioSet-style JSON manifest")
    p.add_argument("--data-root", default="")
    p.add_argument("--checkpoint-dir", default="", help="converted model params dir")
    p.add_argument("--output-dir", default="ap_adapter_output")
    p.add_argument("--train-batch-size", type=int, default=8)
    p.add_argument("--dataloader-prefetch", type=int, default=2,
                   help="background-thread prefetch depth (0 disables); the "
                        "reference's --dataloader_num_workers analogue")
    p.add_argument("--gradient-accumulation-steps", type=int, default=4)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--lr-scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear", "cosine"],
                   help="LR schedule (reference train_apadapter_v2.py:125-134)")
    p.add_argument("--lr-warmup-steps", type=int, default=500)
    p.add_argument("--scale-lr", action="store_true")
    p.add_argument("--adam-beta1", type=float, default=0.9)
    p.add_argument("--adam-beta2", type=float, default=0.999)
    p.add_argument("--adam-weight-decay", type=float, default=1e-2)
    p.add_argument("--adam-epsilon", type=float, default=1e-8)
    p.add_argument("--use-8bit-adam", action="store_true",
                   help="bnb 8-bit Adam parity (train_apadapter_v2.py:733-743): "
                        "bf16 first-moment optimizer state on TPU")
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--max-train-steps", type=int, default=35_000)
    p.add_argument("--checkpointing-steps", type=int, default=3000)
    p.add_argument("--validation-steps", type=int, default=3000)
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--snr-gamma", type=float, default=None)
    p.add_argument("--resume-from-checkpoint", default=None,
                   help="flat adapter dict (.npz or torch .bin)")
    p.add_argument("--random-weights", action="store_true",
                   help="random base weights (pipeline smoke mode)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize UNet blocks in backward (reference "
                        "gradient-checkpointing analogue). Off by default: "
                        "the scan-accumulated step holds one batch-8 "
                        "microbatch of activations, which fits HBM, and "
                        "no-remat measures 710 ms vs remat's recompute "
                        "overhead (docs/PERF.md r3)")
    p.add_argument("--num-validation-audio-files", type=int, default=3,
                   help="validation wavs generated per round "
                        "(reference train_apadapter_v2.py:193)")
    p.add_argument("--report-to", default="jsonl",
                   choices=["jsonl", "tensorboard", "wandb"],
                   help="extra metrics backend (JSONL is always written)")
    p.add_argument("--no-validation", action="store_true",
                   help="disable periodic validation wav sampling")
    args = p.parse_args(argv)

    from ap_adapter_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()  # multi-host: connect processes before backend use

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.adapter.params import import_flat_adapter, init_adapter_from_text_kv
    from ap_adapter_tpu.parallel import mesh as mesh_lib
    from ap_adapter_tpu.pipeline.pipeline import PipelineModules
    from ap_adapter_tpu.pipeline.tasks import load_pipeline, _load_flat_adapter
    from ap_adapter_tpu.train.data import AudioSetDataset, DeviceCollate, data_loader
    from ap_adapter_tpu.train.loop import train
    from ap_adapter_tpu.train.trainer import TrainConfig

    import dataclasses

    config = PipelineConfig()
    # scan_unroll=1 keeps the transformer-block scan's graph dedup (the
    # fwd+bwd module is compile-size-bound, unlike inference); remat is
    # opt-in (--remat) — see the flag help
    config = config.replace(
        unet=dataclasses.replace(config.unet, remat=args.remat, scan_unroll=1))
    pipe = load_pipeline(config, checkpoint_dir=args.checkpoint_dir or None)

    if args.resume_from_checkpoint:
        flat = _load_flat_adapter(args.resume_from_checkpoint)
        pipe.params["unet"] = import_flat_adapter(pipe.params["unet"], flat, config.unet)
    else:
        pipe.params["unet"] = init_adapter_from_text_kv(pipe.params["unet"], config.unet)

    mesh = mesh_lib.create_mesh()
    lr = args.learning_rate
    if args.scale_lr:  # reference scale_lr multiplies by world size and accum
        lr *= args.gradient_accumulation_steps * args.train_batch_size * len(mesh.devices.flat)

    tc = TrainConfig(
        learning_rate=lr,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_weight_decay=args.adam_weight_decay,
        adam_epsilon=args.adam_epsilon,
        use_8bit_adam=args.use_8bit_adam,
        max_grad_norm=args.max_grad_norm,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        per_host_batch_size=args.train_batch_size,
        max_train_steps=args.max_train_steps,
        checkpointing_steps=args.checkpointing_steps,
        validation_steps=args.validation_steps,
        seed=args.seed,
        snr_gamma=args.snr_gamma,
    )

    dataset = AudioSetDataset(
        args.train_manifest, args.data_root, duration_s=args.duration, seed=args.seed
    )
    modules = pipe.modules
    collate = DeviceCollate(modules, pipe.params, duration_s=args.duration, seed=args.seed)
    batches = data_loader(dataset, args.train_batch_size, collate, seed=args.seed)
    if args.dataloader_prefetch > 0:
        from ap_adapter_tpu.train.data import prefetch

        batches = prefetch(batches, depth=args.dataloader_prefetch)

    validation_fn = None
    if not args.no_validation:
        from ap_adapter_tpu.train.validation import make_validation_fn

        validation_fn = make_validation_fn(
            modules, pipe.params, dataset, args.output_dir,
            audio_length_in_s=args.duration, seed=args.seed,
            num_files=args.num_validation_audio_files,
        )

    train(modules, pipe.params, batches, tc, args.output_dir, mesh=mesh,
          validation_fn=validation_fn, report_to=args.report_to)


if __name__ == "__main__":
    main()
