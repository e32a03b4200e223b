"""Training loop driver: steps, checkpoint rotation, adapter export, logging.

Mirrors the reference main() flow (train_apadapter_v2.py:546-1044) minus the
framework plumbing: freeze everything, train the adapter, checkpoint every N
steps (rotating orbax state + flat adapter dict), periodic validation
sampling at a random pooling rate.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterable, Optional

import jax

from ap_adapter_tpu.adapter.params import export_flat_adapter
from ap_adapter_tpu.parallel import mesh as mesh_lib
from ap_adapter_tpu.pipeline.pipeline import PipelineModules
from ap_adapter_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_sharded_train_step,
    make_split_train_step,
    merge_unet_params,
)
from ap_adapter_tpu.utils.checkpoint import TrainCheckpointer, save_flat_adapter
from ap_adapter_tpu.utils.logging import MetricsLogger


def _stack_microbatches(batches, k: int):
    """Group k consecutive loader batches into [k, B, ...] stacked leaves."""

    import numpy as np

    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == k:
            yield jax.tree_util.tree_map(lambda *xs: np.stack(
                [jax.device_get(x) for x in xs]), *buf)
            buf = []


def train(
    modules: PipelineModules,
    params: Dict[str, Any],
    batches: Iterable[Any],
    tc: TrainConfig,
    output_dir: str,
    mesh=None,
    max_steps: Optional[int] = None,
    log_every: int = 50,
    validation_fn=None,
    resume: bool = True,
    report_to: str = "jsonl",
) -> TrainState:
    """Run adapter finetuning. ``batches`` yields collated device batches.

    Returns the final TrainState; writes rotating checkpoints plus the flat
    adapter dict (reference-format keys) to <output_dir>/pytorch_model.npz.

    ``validation_fn(step, unet_params)`` runs every ``tc.validation_steps``
    with the merged (frozen + current adapter) UNet params — the hook for
    validation sampling (reference log_validation,
    train_apadapter_v2.py:483-528); train.validation.make_validation_fn
    builds the default wav-writing one.

    With ``resume`` (default), a run restarted in the same ``output_dir``
    restores the latest orbax checkpoint (params + optimizer state + step)
    and continues — the elastic-recovery counterpart of the reference's
    ``--resume_from_checkpoint`` (train_apadapter_v2.py:649-663), which only
    reloads adapter weights. Per-step RNG is ``fold_in(seed, step)`` so the
    resumed noise/timestep stream matches an uninterrupted run; data order
    restarts (the reference dataloader does too).
    """

    import dataclasses

    os.makedirs(output_dir, exist_ok=True)
    mesh = mesh or mesh_lib.create_mesh()
    max_steps = max_steps or tc.max_train_steps

    # the scan-accumulated TPU step owns accumulation itself, so its
    # optimizer state is the PLAIN AdamW chain (no optax.MultiSteps)
    accum_scan = jax.default_backend() != "cpu" and tc.gradient_accumulation_steps > 1
    state_tc = dataclasses.replace(tc, gradient_accumulation_steps=1) if accum_scan else tc

    frozen = {k: v for k, v in params.items() if k != "unet"}
    state, frozen_unet = create_train_state(state_tc, params["unet"])
    frozen["unet_frozen"] = frozen_unet

    ckpt = TrainCheckpointer(os.path.join(output_dir, "checkpoints"))
    start_step = 1
    if resume:
        latest = ckpt.latest_step()
        if latest is not None:
            state = ckpt.restore(jax.device_get(state), latest)
            start_step = latest + 1

    state = jax.device_put(state, mesh_lib.replicated(mesh))
    frozen = mesh_lib.replicate_params(mesh, frozen)

    # CPU meshes: single jit with optax.MultiSteps (micro-step counting).
    # TPU with accumulation: the scan-of-microbatches step (verified to
    # compile and measured at full scale — see docs/PERF.md); the loop then
    # stacks K consecutive loader batches per optimizer step, and ``step``
    # counts OPTIMIZER steps (matching the reference's global_step,
    # train_apadapter_v2.py:979-987). TPU without accumulation: the split
    # fwd/bwd executables.
    if jax.default_backend() == "cpu":
        step_fn = make_sharded_train_step(modules, tc, frozen, mesh)
    elif accum_scan:
        from ap_adapter_tpu.train.trainer import make_accum_train_step

        step_fn = make_accum_train_step(modules, tc, frozen, mesh)
        batches = _stack_microbatches(batches, tc.gradient_accumulation_steps)
    else:
        step_fn = make_split_train_step(modules, tc, frozen, mesh)
    logger = MetricsLogger(
        os.path.join(output_dir, "metrics.jsonl"),
        tensorboard_dir=(os.path.join(output_dir, "tb")
                         if report_to == "tensorboard" else None),
        wandb_project="ap_adapter_tpu" if report_to == "wandb" else None,
        wandb_config={"max_steps": max_steps, **dataclasses.asdict(tc)},
    )

    rng = jax.random.PRNGKey(tc.seed)
    t0 = time.time()
    for step, batch in enumerate(batches, start=start_step):
        if step > max_steps:
            break
        step_rng = jax.random.fold_in(rng, step)
        if jax.process_count() > 1:
            # each host contributes its local shard of the global batch;
            # stacked accumulation batches are [K, B_local, ...], so the
            # batch axis to assemble across hosts is axis 1, not 0
            from jax.sharding import PartitionSpec as P

            from ap_adapter_tpu.parallel.distributed import shard_host_batch

            spec = P(None, "data") if accum_scan else P("data")
            batch = shard_host_batch(mesh, batch, spec)
        elif not accum_scan:
            batch = mesh_lib.shard_batch(mesh, batch)
        # accum_scan batches are [K, B, ...]; the step's in_shardings place
        # them (microbatch axis unsharded, batch axis over 'data')
        state, metrics = step_fn(state, batch, step_rng)

        is_host0 = jax.process_index() == 0
        if (step % log_every == 0 or step == start_step) and is_host0:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            m.update(step=step,
                     steps_per_s=(step - start_step + 1) / max(time.time() - t0, 1e-9))
            logger.log(m)

        if step % tc.checkpointing_steps == 0 or step == max_steps:
            ckpt.save(step, jax.device_get(state))  # orbax save is collective
            if is_host0:
                merged = merge_unet_params(jax.device_get(state.adapter),
                                           jax.device_get(frozen_unet))
                flat = export_flat_adapter(merged, modules.config.unet)
                save_flat_adapter(os.path.join(output_dir, "pytorch_model.npz"), flat)

        if validation_fn is not None and step % tc.validation_steps == 0 and is_host0:
            validation_fn(step, merge_unet_params(state.adapter, frozen_unet))

    return state
