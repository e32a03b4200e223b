"""The denoising loop: CFG + DDIM as a single ``lax.scan``.

The reference's Python loop over 50 scheduler steps with an in-batch CFG pair
(pipeline_audioldm2.py:1001-1031) becomes one compiled scan — no host round
trips, one executable for the whole denoise.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import SchedulerConfig
from ap_adapter_tpu.diffusion.ddim import DDIMTables, ddim_step, inference_timesteps, make_tables


def ddim_sample_loop(
    unet_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    latents: jnp.ndarray,
    scheduler_config: SchedulerConfig,
    num_inference_steps: int,
    guidance_scale: float | jnp.ndarray,
    do_cfg: bool = True,
    tables: Optional[DDIMTables] = None,
    timesteps: Optional[np.ndarray] = None,
    step_aux=None,
) -> jnp.ndarray:
    """Run the full DDIM denoise.

    unet_fn(latent_model_input [2B or B, ...], t scalar) -> noise prediction.
    With ``do_cfg`` the input batch is [uncond; cond] (reference order:
    negative first — pipeline_audioldm2.py:534-567) and outputs are combined
    as uncond + g * (cond - uncond). ``timesteps`` overrides the schedule
    (e.g. the truncated SDEdit schedule); step spacing still follows
    ``num_inference_steps``.

    ``step_aux``: optional pytree whose leaves carry a leading [T] axis
    (e.g. the hoisted per-step time-embedding rows, models/hoist.py); the
    scan slices it per step and calls unet_fn(model_in, t, aux_slice).
    """

    tables = tables or make_tables(scheduler_config)
    ts = timesteps if timesteps is not None else inference_timesteps(
        scheduler_config, num_inference_steps
    )
    step_ratio = scheduler_config.num_train_timesteps // num_inference_steps
    ts = jnp.asarray(ts, dtype=jnp.int32)
    prev_ts = ts - step_ratio

    b = latents.shape[0]

    def body(carry, xs):
        lat = carry
        t, prev_t, aux = xs
        if do_cfg:
            model_in = jnp.concatenate([lat, lat], axis=0)
        else:
            model_in = lat
        noise_pred = unet_fn(model_in, t) if aux is None else unet_fn(model_in, t, aux)
        if do_cfg:
            uncond, cond = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + jnp.asarray(guidance_scale, uncond.dtype) * (cond - uncond)
        lat = ddim_step(tables, noise_pred, t, prev_t, lat).astype(latents.dtype)
        return lat, None

    latents, _ = jax.lax.scan(body, latents, (ts, prev_ts, step_aux))
    return latents


def sdedit_timesteps(
    scheduler_config: SchedulerConfig, num_inference_steps: int, strength_steps: int
) -> np.ndarray:
    """Truncated schedule for SDEdit-style audio-to-audio (style transfer):
    keep only the last ``strength_steps`` of the descending schedule
    (reference style_transfer_pipeline.py:922-926 uses steps//4*2)."""

    ts = inference_timesteps(scheduler_config, num_inference_steps)
    return ts[len(ts) - strength_steps :]
