"""pjit data-parallel adapter finetuning.

TPU-native re-design of the reference trainer (train_apadapter_v2.py:546-1044):
the train step — VAE-encode the mel, sample noise/timesteps, UNet forward with
adapter scale 1.0 (train_apadapter_v2.py:640), MSE on the epsilon (or v)
target, AdamW on ONLY the 64 adapter matrices — is one jitted function.

Differentiation runs w.r.t. the adapter subtree alone (the frozen UNet weights
enter as constants), so no full-model gradient buffers are ever materialized —
the functional-pytree equivalent of the reference's ``AttnProcsLayers``
trainable wrapper (train_apadapter_v2.py:665-669). Batch arrays are sharded
over the mesh 'data' axis; parameters are replicated, so XLA inserts the
gradient all-reduce over ICI automatically (GSPMD), replacing HF Accelerate's
DDP. Gradient accumulation uses optax.MultiSteps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from ap_adapter_tpu.diffusion.ddim import add_noise, make_tables, velocity_target
from ap_adapter_tpu.models.vae import AutoencoderKL
from ap_adapter_tpu.parallel import mesh as mesh_lib
from ap_adapter_tpu.pipeline.pipeline import PipelineModules


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors train.sh / argparse defaults (reference train_apadapter_v2.py:
    48-251): lr 1e-4 constant, AdamW(0.9, 0.999, wd 1e-2, eps 1e-8),
    grad clip 1.0, effective batch 32 (8 x accum 4 by default here)."""

    learning_rate: float = 1e-4
    # HF get_scheduler parity (train_apadapter_v2.py:125-134, 809-815):
    # reference default is constant (train.sh passes no --lr_scheduler);
    # warmup counts OPTIMIZER steps, matching the reference's global_step.
    lr_scheduler: str = "constant"  # constant|constant_with_warmup|linear|cosine
    lr_warmup_steps: int = 500
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    # bitsandbytes --use_8bit_adam parity (train_apadapter_v2.py:733-743):
    # on TPU the equivalent memory lever is low-precision optimizer moments
    # (bf16 mu); the adapter is only ~42 MB so this is a parity flag, not a
    # necessity.
    use_8bit_adam: bool = False
    gradient_accumulation_steps: int = 4
    per_host_batch_size: int = 8
    max_train_steps: int = 35_000
    checkpointing_steps: int = 3000
    validation_steps: int = 3000
    seed: int = 42
    scale_lr: bool = False
    snr_gamma: Optional[float] = None  # min-SNR weighting (off by default)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    adapter: Any  # trainable adapter subtree (nested, ip leaves only)
    opt_state: Any


def _is_adapter_key(key: Tuple[str, ...]) -> bool:
    return any(k in ("to_k_ip", "to_v_ip") for k in key)


def split_unet_params(unet_params) -> Tuple[Any, Any]:
    """-> (adapter_tree, frozen_tree) as nested dicts (disjoint key sets)."""

    flat = traverse_util.flatten_dict(unet_params)
    adapter = {k: v for k, v in flat.items() if _is_adapter_key(k)}
    frozen = {k: v for k, v in flat.items() if not _is_adapter_key(k)}
    return traverse_util.unflatten_dict(adapter), traverse_util.unflatten_dict(frozen)


def merge_unet_params(adapter, frozen):
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(adapter))
    return traverse_util.unflatten_dict(flat)


def make_lr_schedule(tc: TrainConfig) -> optax.Schedule:
    """optax schedule matching HF diffusers ``get_scheduler`` semantics for
    the four variants the reference trainer exposes
    (train_apadapter_v2.py:125-134, 809-815): linear warmup from 0 over
    ``lr_warmup_steps`` (except plain constant), then constant / linear-to-0
    at ``max_train_steps`` / half-cosine-to-0."""

    lr, w, total = tc.learning_rate, tc.lr_warmup_steps, tc.max_train_steps
    if tc.lr_scheduler == "constant":
        return optax.constant_schedule(lr)
    warmup = optax.linear_schedule(0.0, lr, max(w, 1))
    if tc.lr_scheduler == "constant_with_warmup":
        tail: optax.Schedule = optax.constant_schedule(lr)
    elif tc.lr_scheduler == "linear":
        tail = optax.linear_schedule(lr, 0.0, max(total - w, 1))
    elif tc.lr_scheduler == "cosine":
        tail = optax.cosine_decay_schedule(lr, max(total - w, 1))
    else:
        raise ValueError(f"unknown lr_scheduler: {tc.lr_scheduler!r}")
    return optax.join_schedules([warmup, tail], [w])


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(
            make_lr_schedule(tc),
            b1=tc.adam_beta1,
            b2=tc.adam_beta2,
            eps=tc.adam_epsilon,
            weight_decay=tc.adam_weight_decay,
            mu_dtype=jnp.bfloat16 if tc.use_8bit_adam else None,
        ),
    )
    if tc.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.gradient_accumulation_steps)
    return tx


def create_train_state(tc: TrainConfig, unet_params) -> Tuple[TrainState, Any]:
    """-> (TrainState over the adapter subtree, frozen UNet subtree)."""

    adapter, frozen_unet = split_unet_params(unet_params)
    tx = make_optimizer(tc)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        adapter=adapter,
        opt_state=tx.init(adapter),
    )
    return state, frozen_unet


def _make_loss_fn(
    modules: PipelineModules,
    tc: TrainConfig,
) -> Callable:
    """loss_fn(adapter_params, frozen_params, batch, rng) -> scalar MSE (the
    reference objective, train_apadapter_v2.py:892-954).

    ``frozen_params`` is an explicit ARGUMENT, never a closure: closed-over
    param trees become HLO constants, and a module carrying 740M literal
    weights breaks the remote-compile transport (this exact failure burned
    hours of r2 as "broken pipe" — and r1's entry() notes already warned
    about it).
    """

    cfg = modules.config
    tables = make_tables(cfg.scheduler)

    def loss_fn(adapter_params, frozen_params, batch, rng):
        rng_z, rng_noise, rng_t = jax.random.split(rng, 3)
        latents = modules.vae.apply(
            {"params": frozen_params["vae"]},
            batch["mel"].astype(cfg.dtype),
            rng_z,
            method=AutoencoderKL.encode,
        ).astype(jnp.float32)

        noise = jax.random.normal(rng_noise, latents.shape, dtype=jnp.float32)
        t = jax.random.randint(
            rng_t, (latents.shape[0],), 0, cfg.scheduler.num_train_timesteps
        )
        noisy = add_noise(tables, latents, noise, t)

        unet_params = merge_unet_params(adapter_params, frozen_params["unet_frozen"])
        pred = modules.unet.apply(
            {"params": unet_params},
            noisy.astype(cfg.dtype),
            t.astype(jnp.float32),
            batch["generated_prompt_embeds"],
            batch["prompt_embeds"],
            batch.get("attention_mask"),
            ip_scale=1.0,  # training scale (train_apadapter_v2.py:640)
        ).astype(jnp.float32)

        if cfg.scheduler.prediction_type == "epsilon":
            target = noise
        elif cfg.scheduler.prediction_type == "v_prediction":
            target = velocity_target(tables, latents, noise, t)
        else:
            raise ValueError(cfg.scheduler.prediction_type)

        err = jnp.square(pred - target)
        if tc.snr_gamma is not None:
            a = tables.alphas_cumprod[t]
            snr = a / (1.0 - a)
            w = jnp.minimum(snr, tc.snr_gamma) / snr
            err = err * w[:, None, None, None]
        return jnp.mean(err)

    return loss_fn


def make_train_step(
    modules: PipelineModules,
    tc: TrainConfig,
    frozen_params: Dict[str, Any],
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    ``frozen_params``: {"unet_frozen": <non-adapter unet tree>, "vae": ...}.
    ``batch``: dict with
      mel                     [B, T, F, 1]
      generated_prompt_embeds [B, 8+n_audio, 768]  (GPT-2 ‖ pooled AudioMAE)
      prompt_embeds           [B, S1, 1024]        (T5 stream)
      attention_mask          [B, S1]
    (same contract as the reference collate output,
    train_apadapter_v2.py:472-479).
    """

    tx = make_optimizer(tc)
    loss_fn = _make_loss_fn(modules, tc)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        loss, grads = jax.value_and_grad(loss_fn)(state.adapter, frozen_params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.adapter)
        adapter = optax.apply_updates(state.adapter, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, adapter=adapter, opt_state=opt_state),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


def make_sharded_step_impl(modules, tc, mesh):
    """The raw jitted GSPMD train step ``step_impl(state, frozen, batch,
    rng)``: batch over 'data', params replicated, state donated. Exposed so
    compile-only checks can ``.lower()`` it with abstract shapes
    (__graft_entry__.dryrun_multichip full-config check)."""

    tx = make_optimizer(tc)
    loss_fn = _make_loss_fn(modules, tc)
    rep = mesh_lib.replicated(mesh)
    dat = mesh_lib.batch_sharding(mesh)

    @functools.partial(jax.jit, in_shardings=(rep, rep, dat, rep),
                       out_shardings=(rep, rep), donate_argnums=(0,))
    def step_impl(state, frozen, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.adapter, frozen, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.adapter)
        adapter = optax.apply_updates(state.adapter, updates)
        return (
            TrainState(step=state.step + 1, adapter=adapter, opt_state=opt_state),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return step_impl


def make_sharded_train_step(modules, tc, frozen_params, mesh):
    """jit the train step with GSPMD shardings: batch over 'data', params
    replicated. Donates state to keep optimizer memory in place."""

    step_impl = make_sharded_step_impl(modules, tc, mesh)
    # frozen params travel as a jit ARGUMENT (device-resident), never a
    # closure — closed-over trees become HLO constants and a module carrying
    # 740M literal weights breaks the remote-compile transport
    return lambda state, batch, rng: step_impl(state, frozen_params, batch, rng)


def make_accum_train_step(modules, tc, frozen_params, mesh):
    """Gradient accumulation as a ``lax.scan`` over microbatches: ONE
    optimizer step per call over ``tc.gradient_accumulation_steps`` stacked
    microbatches (the train.sh batch 8 x accum 4 recipe).

    Besides being the natural accumulation structure (no optax.MultiSteps
    bookkeeping), the scan places the UNet fwd+bwd inside a loop BODY —
    the same shape as the inference pipeline's 50-step denoise scan, which
    the remote-compile service handles, where the flat fwd+bwd module does
    not (repeated broken-pipe failures; see make_split_train_step).

    ``batch`` leaves here are [K, B_micro, ...] (K = accumulation steps).
    The optimizer is the plain AdamW chain (no MultiSteps), so ``state``
    must come from ``create_train_state`` with a tc whose
    gradient_accumulation_steps == 1.
    """

    tc_inner = dataclasses.replace(tc, gradient_accumulation_steps=1)
    tx = make_optimizer(tc_inner)
    loss_and_grad = jax.value_and_grad(_make_loss_fn(modules, tc))

    k = tc.gradient_accumulation_steps
    rep = mesh_lib.replicated(mesh)
    # [K, B_micro, ...]: microbatch axis unsharded, batch axis over 'data'
    dat = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))

    @functools.partial(jax.jit, in_shardings=(rep, rep, dat, rep),
                       out_shardings=(rep, rep), donate_argnums=(0,))
    def step_impl(state, frozen, batch, rng):
        rngs = jax.random.split(rng, k)

        def body(acc, xs):
            mb, r = xs
            loss, grads = loss_and_grad(state.adapter, frozen, mb, r)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return acc, loss

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.adapter)
        grads, losses = jax.lax.scan(body, zeros, (batch, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / k, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.adapter)
        adapter = optax.apply_updates(state.adapter, updates)
        return (
            TrainState(step=state.step + 1, adapter=adapter, opt_state=opt_state),
            {"loss": jnp.mean(losses), "grad_norm": optax.global_norm(grads)},
        )

    # frozen as jit argument: see make_sharded_train_step comment
    return lambda state, batch, rng: step_impl(state, frozen_params, batch, rng)


def make_split_train_step(modules, tc, frozen_params, mesh):
    """Train step as THREE separately-compiled executables: forward (loss +
    VJP residuals), backward (residuals -> grads), optimizer update.

    The monolithic fwd+bwd module of the full-scale UNet exceeds what the
    remote-compile service will accept (broken pipe after ~40-80 min,
    observed repeatedly); splitting via ``jax.vjp``'s returnable
    ``tree_util.Partial`` keeps each module roughly fwd-sized. Residuals
    (small under UNetConfig.remat) stay on device between the calls.
    Returns train_step(state, batch, rng) with the same contract as
    make_sharded_train_step.
    """

    tx = make_optimizer(tc)
    loss_fn = _make_loss_fn(modules, tc)

    rep = mesh_lib.replicated(mesh)
    dat = mesh_lib.batch_sharding(mesh)

    @functools.partial(jax.jit, in_shardings=(rep, rep, dat, rep))
    def fwd(adapter, frozen, batch, rng):
        loss, vjp_fn = jax.vjp(lambda a: loss_fn(a, frozen, batch, rng), adapter)
        return loss, vjp_fn

    @jax.jit
    def bwd(vjp_fn):
        (grads,) = vjp_fn(jnp.float32(1.0))
        return grads

    @functools.partial(jax.jit, in_shardings=(rep, rep), donate_argnums=(0,))
    def update(state, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.adapter)
        adapter = optax.apply_updates(state.adapter, updates)
        return (
            TrainState(step=state.step + 1, adapter=adapter, opt_state=opt_state),
            optax.global_norm(grads),
        )

    def train_step(state, batch, rng):
        loss, vjp_fn = fwd(state.adapter, frozen_params, batch, rng)
        grads = bwd(vjp_fn)
        state, gnorm = update(state, grads)
        return state, {"loss": loss, "grad_norm": gnorm}

    return train_step
