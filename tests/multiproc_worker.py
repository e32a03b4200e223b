"""Worker payload for the multi-process distributed test.

Usage: python tests/multiproc_worker.py <process_id> <coordinator_addr>

Two of these (4 virtual CPU devices each) form one 8-device global mesh and
run the real sharded adapter train step — the CPU stand-in for a 2-host TPU
slice (SURVEY §2.5 / §4: multi-device tests via host-platform simulation).
Prints "LOSSES <l0> <l1>" on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, coord = int(sys.argv[1]), sys.argv[2]
    os.environ["APX_NUM_PROCESSES"] = "2"
    os.environ["APX_PROCESS_ID"] = str(pid)
    os.environ["APX_COORDINATOR"] = coord
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 " + os.environ.get("XLA_FLAGS", "")
    )

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at import; flip back to CPU
    jax.config.update("jax_platforms", "cpu")

    from ap_adapter_tpu.parallel.distributed import (
        host_local_batch_size,
        maybe_initialize,
        shard_host_batch,
    )

    assert maybe_initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp

    from ap_adapter_tpu.configs import tiny_pipeline_config
    from ap_adapter_tpu.parallel import mesh as mesh_lib
    from ap_adapter_tpu.pipeline.pipeline import PipelineModules
    from ap_adapter_tpu.train.trainer import TrainConfig, create_train_state, make_sharded_train_step

    cfg = tiny_pipeline_config()
    modules = PipelineModules(cfg)
    params = modules.init_params(seed=0)  # identical on both processes

    mesh = mesh_lib.create_mesh()  # spans all 8 global devices
    tc = TrainConfig(gradient_accumulation_steps=1, learning_rate=1e-3)

    frozen = {k: v for k, v in params.items() if k != "unet"}
    state, frozen_unet = create_train_state(tc, params["unet"])
    frozen["unet_frozen"] = frozen_unet
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    frozen = mesh_lib.replicate_params(mesh, frozen)
    step_fn = make_sharded_train_step(modules, tc, frozen, mesh)

    local_b = host_local_batch_size(8)
    s1, n_audio = 5, 4
    cross_1024 = [d for d in cfg.unet.cross_attention_dims if d][-1]
    rng = np.random.default_rng(0)  # same data stream on both hosts...
    full = {
        "mel": rng.standard_normal((8, 32, cfg.mel.num_mel_bins, 1)).astype(np.float32),
        "generated_prompt_embeds": rng.standard_normal(
            (8, cfg.unet.adapter_num_tokens + n_audio,
             cfg.unet.adapter_cross_attention_dim)).astype(np.float32),
        "prompt_embeds": rng.standard_normal((8, s1, cross_1024)).astype(np.float32),
        "attention_mask": np.ones((8, s1), np.int32),
    }
    # ...each host feeds its own half of the global batch
    local = {k: v[pid * local_b:(pid + 1) * local_b] for k, v in full.items()}

    losses = []
    for step in range(1, 3):
        batch = shard_host_batch(mesh, local)
        state, metrics = step_fn(state, batch, jax.random.fold_in(jax.random.PRNGKey(0), step))
        losses.append(float(jax.device_get(metrics["loss"])))

    assert all(np.isfinite(losses)), losses
    print(f"LOSSES {losses[0]:.6f} {losses[1]:.6f}", flush=True)

    # --- scan-accumulation multi-host case (the train.sh recipe shape):
    # stacked [K, B_local, ...] microbatches assemble across hosts on axis 1
    # (P(None, 'data')); sharding axis 0 would scatter the K microbatches
    # across processes and fail at trace (K*P rows vs K rngs)
    from jax.sharding import PartitionSpec as P

    from ap_adapter_tpu.train.trainer import make_accum_train_step

    k = 2
    tc_accum = TrainConfig(gradient_accumulation_steps=k, learning_rate=1e-3)
    state2, _ = create_train_state(tc, params["unet"])  # plain AdamW state
    state2 = jax.device_put(state2, mesh_lib.replicated(mesh))
    accum_fn = make_accum_train_step(modules, tc_accum, frozen, mesh)

    stacked_local = {kk: np.stack([v, v[::-1]]) for kk, v in local.items()}
    accum_losses = []
    for step in range(1, 3):
        batch = shard_host_batch(mesh, stacked_local, P(None, "data"))
        assert batch["mel"].shape[0] == k, batch["mel"].shape
        assert batch["mel"].shape[1] == 8, batch["mel"].shape  # global batch
        state2, metrics = accum_fn(
            state2, batch, jax.random.fold_in(jax.random.PRNGKey(1), step))
        accum_losses.append(float(jax.device_get(metrics["loss"])))

    assert all(np.isfinite(accum_losses)), accum_losses
    print(f"ACCUM_LOSSES {accum_losses[0]:.6f} {accum_losses[1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
