"""Time the FULL-SCALE adapter train step on the real TPU chip.

Fills BASELINE.md row 5 ("adapter finetune, eff. batch 32"): per-microbatch
step time at batch 8 (x4 accumulation = effective 32, the train.sh recipe)
with remat'd UNet blocks, bf16 compute, fp32 adapter/optimizer states.

Prints one JSON line {"steps_per_s", "ms_per_step", "effective_batch_32_per_s"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
ACCUM = 4
N_AUDIO = 128  # pool 2x2 -> 512/4 audio tokens
T5_LEN = 64


def main() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.parallel import mesh as mesh_lib
    from ap_adapter_tpu.pipeline.pipeline import PipelineModules, cast_params_to
    from ap_adapter_tpu.train.trainer import (
        TrainConfig, create_train_state, make_accum_train_step,
    )

    config = PipelineConfig()
    remat = os.environ.get("AP_TRAIN_REMAT", "0") == "1"
    unroll = int(os.environ.get("AP_TRAIN_SCAN_UNROLL", "1"))
    config = config.replace(
        unet=dataclasses.replace(config.unet, remat=remat, scan_unroll=unroll))
    modules = PipelineModules(config)
    params = modules.init_params(seed=0)

    tc = TrainConfig(gradient_accumulation_steps=ACCUM, per_host_batch_size=BATCH)
    tc1 = TrainConfig(gradient_accumulation_steps=1, per_host_batch_size=BATCH)
    mesh = mesh_lib.create_mesh()

    frozen = {k: v for k, v in params.items() if k != "unet"}
    state, frozen_unet = create_train_state(tc1, params["unet"])
    frozen["unet_frozen"] = frozen_unet
    # frozen weights in bf16 (inference precision); adapter + opt states fp32
    frozen = cast_params_to(frozen, jnp.bfloat16)
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    frozen = mesh_lib.replicate_params(mesh, frozen)
    # scan-of-microbatches step: one optimizer step per call; the fwd+bwd
    # lives in a loop body, which the remote-compile service handles where
    # the flat module does not (trainer.make_accum_train_step)
    step_fn = make_accum_train_step(modules, tc, frozen, mesh)

    rng = np.random.default_rng(0)
    mel_frames = 1024  # 10 s at 102.4 frames/s (train_apadapter_v2.py:308-336)
    # [K, B_micro, ...] stacked microbatches (effective batch 32 = 4 x 8)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (ACCUM, BATCH, mel_frames, config.mel.num_mel_bins, 1)).astype(np.float32)),
        "generated_prompt_embeds": jnp.asarray(rng.standard_normal(
            (ACCUM, BATCH, config.gpt2.max_new_tokens + N_AUDIO, 768)).astype(np.float32)),
        "prompt_embeds": jnp.asarray(rng.standard_normal(
            (ACCUM, BATCH, T5_LEN, 1024)).astype(np.float32)),
        "attention_mask": jnp.ones((ACCUM, BATCH, T5_LEN), jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, key)
    print(f"first step (incl. compile): {time.perf_counter() - t0:.1f} s, "
          f"loss={float(metrics['loss']):.4f}", file=sys.stderr)

    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
    loss = float(metrics["loss"])  # host sync
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "adapter_train_step_eff_batch32_bf16",
        "ms_per_optimizer_step": round(dt * 1e3, 1),
        "ms_per_microbatch8": round(dt * 1e3 / ACCUM, 1),
        "optimizer_steps_per_s": round(1.0 / dt, 3),
        "clips_per_s_training": round(ACCUM * BATCH / dt, 2),
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
