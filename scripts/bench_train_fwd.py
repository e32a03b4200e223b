"""Measure the FORWARD train loss (VAE-encode + noise + UNet + MSE) on the
real chip at the train.sh microbatch size.

Context (docs/PERF.md "train-step compile saga"): every fwd+bwd-bearing
module of the full-scale UNet breaks the remote-compile transport, in all
five structural variants tried. The forward module compiles like the
inference pipeline. BASELINE.md row 5 therefore records the measured
forward time and a 3x projection for fwd+bwd (bwd FLOPs = 2x fwd at equal
MFU), until the segmented-vjp compile lands.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, N_AUDIO, T5_LEN = 8, 128, 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.pipeline.pipeline import PipelineModules, cast_params_to
    from ap_adapter_tpu.train.trainer import TrainConfig, _make_loss_fn, split_unet_params

    config = PipelineConfig()
    modules = PipelineModules(config)
    params = modules.init_params(seed=0)
    adapter, frozen_unet = split_unet_params(params["unet"])
    frozen = {k: v for k, v in params.items() if k != "unet"}
    frozen["unet_frozen"] = frozen_unet
    frozen = cast_params_to(frozen, jnp.bfloat16)
    frozen = jax.device_put(frozen)
    adapter = jax.device_put(adapter)

    loss_fn = jax.jit(_make_loss_fn(modules, TrainConfig(), frozen))

    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (BATCH, 1024, config.mel.num_mel_bins, 1)).astype(np.float32)),
        "generated_prompt_embeds": jnp.asarray(rng.standard_normal(
            (BATCH, config.gpt2.max_new_tokens + N_AUDIO, 768)).astype(np.float32)),
        "prompt_embeds": jnp.asarray(rng.standard_normal(
            (BATCH, T5_LEN, 1024)).astype(np.float32)),
        "attention_mask": jnp.ones((BATCH, T5_LEN), jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    loss = float(loss_fn(adapter, batch, key))
    print(f"first call (incl. compile): {time.perf_counter() - t0:.1f} s, "
          f"loss={loss:.4f}", file=sys.stderr)

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        out = loss_fn(adapter, batch, jax.random.fold_in(key, i))
    loss = float(out)  # host sync
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "train_loss_forward_microbatch8_bf16",
        "ms_forward": round(dt * 1e3, 1),
        "projected_ms_fwd_bwd": round(dt * 3e3, 1),
        "projected_eff_batch32_steps_per_s": round(1.0 / (dt * 3 * 4), 3),
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
