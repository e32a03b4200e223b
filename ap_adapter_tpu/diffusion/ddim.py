"""DDIM scheduler as pure functions over precomputed alpha tables.

Matches diffusers ``DDIMScheduler`` (eta=0) with the cvssp/audioldm2 config
(scaled_linear betas 0.0015->0.0195, 1000 train steps, epsilon prediction,
leading spacing, steps_offset=1) as used at reference
pipeline_audioldm2.py:983-1025 and train_apadapter_v2.py:901-911. All state
lives in a small ``DDIMTables`` pytree so the whole 50-step denoise compiles
into one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import SchedulerConfig


@dataclasses.dataclass(frozen=True)
class DDIMTables:
    alphas_cumprod: jnp.ndarray  # [num_train_timesteps]
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_train_timesteps: int
    prediction_type: str
    clip_sample: bool


def make_tables(config: SchedulerConfig = SchedulerConfig()) -> DDIMTables:
    if config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                config.beta_start ** 0.5,
                config.beta_end ** 0.5,
                config.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif config.beta_schedule == "linear":
        betas = np.linspace(
            config.beta_start, config.beta_end, config.num_train_timesteps, dtype=np.float64
        )
    else:
        raise ValueError(f"unsupported beta schedule {config.beta_schedule}")

    alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
    final = np.float32(1.0) if config.set_alpha_to_one else alphas_cumprod[0]
    return DDIMTables(
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=config.num_train_timesteps,
        prediction_type=config.prediction_type,
        clip_sample=config.clip_sample,
    )


def inference_timesteps(config: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending timestep array ('leading' spacing + steps_offset)."""

    if config.timestep_spacing == "leading":
        step_ratio = config.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts = ts + config.steps_offset
    elif config.timestep_spacing == "trailing":
        step_ratio = config.num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(config.num_train_timesteps, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"unsupported timestep spacing {config.timestep_spacing}")
    return ts


def _get_alpha(tables: DDIMTables, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t], or final_alpha_cumprod for t < 0."""

    a = tables.alphas_cumprod[jnp.clip(t, 0, tables.num_train_timesteps - 1)]
    return jnp.where(t < 0, tables.final_alpha_cumprod, a)


def ddim_step(
    tables: DDIMTables,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """One deterministic DDIM update x_t -> x_{prev_t} (eta = 0).

    ``prev_t`` is t - num_train_timesteps//num_inference_steps (may be < 0).
    Computed in fp32 regardless of the model dtype.
    """

    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)

    a_t = _get_alpha(tables, t)
    a_prev = _get_alpha(tables, prev_t)
    b_t = 1.0 - a_t

    if tables.prediction_type == "epsilon":
        x0 = (sample - jnp.sqrt(b_t) * model_output) / jnp.sqrt(a_t)
        eps = model_output
    elif tables.prediction_type == "v_prediction":
        x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(b_t) * model_output
        eps = jnp.sqrt(a_t) * model_output + jnp.sqrt(b_t) * sample
    elif tables.prediction_type == "sample":
        x0 = model_output
        eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(b_t)
    else:
        raise ValueError(tables.prediction_type)

    if tables.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    direction = jnp.sqrt(1.0 - a_prev) * eps
    return jnp.sqrt(a_prev) * x0 + direction


def add_noise(
    tables: DDIMTables,
    samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) noise (training forward)."""

    a = tables.alphas_cumprod[timesteps].astype(jnp.float32)
    while a.ndim < samples.ndim:
        a = a[..., None]
    return jnp.sqrt(a) * samples.astype(jnp.float32) + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)


def velocity_target(
    tables: DDIMTables,
    samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """v = sqrt(a_t) eps - sqrt(1-a_t) x0 (for prediction_type='v_prediction')."""

    a = tables.alphas_cumprod[timesteps].astype(jnp.float32)
    while a.ndim < samples.ndim:
        a = a[..., None]
    return jnp.sqrt(a) * noise.astype(jnp.float32) - jnp.sqrt(1.0 - a) * samples.astype(jnp.float32)
