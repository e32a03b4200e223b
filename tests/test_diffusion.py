"""DDIM scheduler tests vs an independent numpy reference implementation."""

import pytest
import numpy as np
import jax.numpy as jnp

from ap_adapter_tpu.configs import SchedulerConfig
from ap_adapter_tpu.diffusion.ddim import (
    add_noise,
    ddim_step,
    inference_timesteps,
    make_tables,
    velocity_target,
)
from ap_adapter_tpu.diffusion.sampling import ddim_sample_loop


CFG = SchedulerConfig()


pytestmark = pytest.mark.quick

def np_alphas(cfg=CFG):
    betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, cfg.num_train_timesteps) ** 2
    return np.cumprod(1 - betas)


def test_timesteps_leading_spacing():
    ts = inference_timesteps(CFG, 50)
    assert len(ts) == 50
    # leading: arange(50)*20 reversed, +1 offset
    want = (np.arange(50) * 20)[::-1] + 1
    np.testing.assert_array_equal(ts, want)


def test_ddim_step_matches_numpy(rng):
    tables = make_tables(CFG)
    ac = np_alphas()
    x = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)

    t, prev_t = 981, 961
    a_t, a_prev = ac[t], ac[prev_t]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps

    got = ddim_step(tables, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(prev_t), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    # final step: prev_t < 0 -> final_alpha_cumprod = alphas_cumprod[0] (set_alpha_to_one=False)
    t, prev_t = 1, -19
    a_t, a_prev = ac[1], ac[0]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    got = ddim_step(tables, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(prev_t), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_add_noise_and_velocity(rng):
    tables = make_tables(CFG)
    ac = np_alphas()
    x = rng.standard_normal((3, 2, 2, 1)).astype(np.float32)
    n = rng.standard_normal((3, 2, 2, 1)).astype(np.float32)
    t = np.array([0, 500, 999])
    got = add_noise(tables, jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
    want = np.sqrt(ac[t])[:, None, None, None] * x + np.sqrt(1 - ac[t])[:, None, None, None] * n
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    v = velocity_target(tables, jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
    wantv = np.sqrt(ac[t])[:, None, None, None] * n - np.sqrt(1 - ac[t])[:, None, None, None] * x
    np.testing.assert_allclose(np.asarray(v), wantv, rtol=1e-5, atol=1e-6)


def test_sample_loop_reaches_x0_for_identity_model(rng):
    """If the model perfectly predicts the added noise, DDIM from x_T must
    recover x_0 (up to fp error) — run 10 steps on a constant-noise problem."""

    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    tables = make_tables(CFG)
    ts = inference_timesteps(CFG, 10)
    ac = np_alphas()

    # start at the highest timestep of the schedule
    a_T = ac[ts[0]]
    x_T = np.sqrt(a_T) * x0 + np.sqrt(1 - a_T) * eps

    def unet_fn(model_in, t):
        # CFG batch of 2: both halves return the true eps
        return jnp.concatenate([jnp.asarray(eps)] * 2, axis=0)

    out = ddim_sample_loop(
        unet_fn, jnp.asarray(x_T), CFG, num_inference_steps=10,
        guidance_scale=3.0, do_cfg=True,
    )
    # with set_alpha_to_one=False the loop lands at alphas_cumprod[0], not 1:
    want = np.sqrt(ac[0]) * x0 + np.sqrt(1 - ac[0]) * eps
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)
