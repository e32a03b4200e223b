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

    # --- multi-host SERVING (VERDICT r4 item 8): host-local fbank DSP for
    # THIS host's clips only, global batch assembled across processes, one
    # sharded generate over the 2x4 global mesh. The parent test regenerates
    # the same deterministic inputs, runs the single-process pipeline, and
    # asserts each host's output shard matches it.
    out_path = sys.argv[3] if len(sys.argv) > 3 else ""
    if out_path:
        from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline, TextBatch

        b_global = 8
        local_b2 = host_local_batch_size(b_global)
        rng2 = np.random.default_rng(7)  # same stream as the parent test
        src = rng2.standard_normal((b_global, 3200)).astype(np.float32) * 0.1
        ci = rng2.integers(2, cfg.clap.vocab_size, (b_global, 6)).astype(np.int32)
        ti = rng2.integers(2, cfg.t5.vocab_size, (b_global, 5)).astype(np.int32)
        nci = rng2.integers(2, cfg.clap.vocab_size, (b_global, 6)).astype(np.int32)
        nti = rng2.integers(2, cfg.t5.vocab_size, (b_global, 5)).astype(np.int32)

        spipe = AudioLDM2Pipeline(cfg, params, mesh=mesh)
        mine = slice(pid * local_b2, (pid + 1) * local_b2)
        # host-local DSP: each process fbanks only its own clips
        fb_local = np.concatenate(
            [np.asarray(spipe.prepare_fbank(w, cfg.fbank.sample_rate))
             for w in src[mine]], axis=0)
        gb = shard_host_batch(mesh, {
            "fb": fb_local,
            "ci": ci[mine], "ti": ti[mine], "nci": nci[mine], "nti": nti[mine],
            "cm": np.ones((local_b2, 6), np.int32),
            "tm": np.ones((local_b2, 5), np.int32),
        })
        pos = TextBatch(clap_ids=gb["ci"], clap_mask=gb["cm"],
                        t5_ids=gb["ti"], t5_mask=gb["tm"])
        neg = TextBatch(clap_ids=gb["nci"], clap_mask=gb["cm"],
                        t5_ids=gb["nti"], t5_mask=gb["tm"])
        wav = spipe.generate(
            pos, neg, gb["fb"], audio_length_in_s=0.2, num_inference_steps=2,
            guidance_scale=3.0, ap_scale=0.5, time_pool=2, freq_pool=2,
            seed=0, materialize=False)  # np.asarray on a global array raises
        shards = sorted(wav.addressable_shards, key=lambda s: s.index[0].start or 0)
        local_wav = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        samples = int(0.2 * cfg.vocoder.sampling_rate)
        np.save(out_path, local_wav[:, :samples])
        print("SERVE_OK", flush=True)


if __name__ == "__main__":
    main()
