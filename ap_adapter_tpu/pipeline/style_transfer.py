"""SDEdit-style audio-to-audio pipeline (style transfer).

TPU-native equivalent of the reference ``style_transfer_pipeline.py``
(:905-981): instead of starting from pure noise, the source clip's VAE latent
is noised to a mid-schedule timestep and denoised over the truncated tail of
the DDIM schedule (the reference keeps the last ``steps - steps//4*2`` steps).
Also fixes the reference's broken import (it references a nonexistent
``train_ipadapter_v2`` module) by owning the mel front-end here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.audio.mel import wav_to_vae_mel
from ap_adapter_tpu.diffusion.ddim import add_noise, inference_timesteps, make_tables
from ap_adapter_tpu.diffusion.sampling import ddim_sample_loop
from ap_adapter_tpu.models.vae import AutoencoderKL
from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline, PipelineModules, TextBatch


def sdedit_generate_waveform(
    modules: PipelineModules,
    params,
    rng: jax.Array,
    source_waveform: jnp.ndarray,  # [B, N] 16 kHz, full clip
    fbank: Optional[jnp.ndarray],
    text_pos: TextBatch,
    text_neg: TextBatch,
    *,
    num_inference_steps: int,
    guidance_scale,
    ap_scale,
    time_pool: int,
    freq_pool: int,
    mel_frames: int,
) -> jnp.ndarray:
    """Pure function: source audio + prompts -> edited waveform."""

    c = modules.config

    mel = wav_to_vae_mel(source_waveform, mel_frames, c.mel)[..., None]
    rng_z, rng_n = jax.random.split(rng)
    latents = modules.vae.apply(
        {"params": params["vae"]}, mel.astype(c.dtype), rng_z, method=AutoencoderKL.encode
    ).astype(jnp.float32)

    # truncated schedule: drop the first steps//4*2 (high-noise) steps
    # (reference style_transfer_pipeline.py:922-926)
    full_ts = inference_timesteps(c.scheduler, num_inference_steps)
    shallow = num_inference_steps // 4 * 2
    ts = full_ts[shallow:]

    tables = make_tables(c.scheduler)
    noise = jax.random.normal(rng_n, latents.shape, dtype=jnp.float32)
    latents = add_noise(tables, latents, noise, jnp.asarray([int(ts[0])]))

    both = TextBatch(
        clap_ids=jnp.concatenate([text_neg.clap_ids, text_pos.clap_ids]),
        clap_mask=jnp.concatenate([text_neg.clap_mask, text_pos.clap_mask]),
        t5_ids=jnp.concatenate([text_neg.t5_ids, text_pos.t5_ids]),
        t5_mask=jnp.concatenate([text_neg.t5_mask, text_pos.t5_mask]),
    )
    t5_hidden, t5_mask, gpt2_tokens = modules.encode_prompt(params, both)
    if fbank is not None:
        audio_tokens = modules.encode_audio(params, fbank, time_pool, freq_pool, with_uncond=True)
        ehs0 = jnp.concatenate([gpt2_tokens, audio_tokens.astype(gpt2_tokens.dtype)], axis=1)
    else:
        ehs0 = gpt2_tokens

    # step-invariant hoisting (models/hoist.py) — same serving optimization
    # as the main pipeline, over the truncated schedule
    ctx_kv = None
    step_aux = None
    if c.hoist_step_invariants and not c.unet.use_int8:
        # (int8 serving keeps its own in-kernel K/V path — see pipeline.py)
        from ap_adapter_tpu.models.hoist import (
            precompute_cross_kv, precompute_temb_rows)

        ctx_kv = precompute_cross_kv(
            params["unet"], c.unet, ehs0, t5_hidden, t5_mask, c.dtype)
        step_aux = {"temb": precompute_temb_rows(
            params["unet"], c.unet, np.asarray(ts), c.dtype)}

    def unet_fn(model_in, t, aux=None):
        tt = jnp.broadcast_to(t.astype(jnp.float32), (model_in.shape[0],))
        from ap_adapter_tpu.pipeline.pipeline import unet_variables

        return modules.unet.apply(
            unet_variables(params), model_in.astype(c.dtype), tt,
            ehs0, t5_hidden, t5_mask, ip_scale=ap_scale,
            ctx_kv=ctx_kv,
            temb_rows=aux["temb"] if aux is not None else None,
        )

    latents = ddim_sample_loop(
        unet_fn, latents, c.scheduler,
        num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale, do_cfg=True, timesteps=ts,
        step_aux=step_aux,
    )

    mel_out = modules.vae.apply(
        {"params": params["vae"]},
        (latents / c.vae.scaling_factor).astype(c.dtype),
        method=AutoencoderKL.decode,
    )
    wav = modules.vocoder.apply({"params": params["vocoder"]}, mel_out[..., 0].astype(jnp.float32))
    return wav.astype(jnp.float32)


def generate_style_transfer(
    pipe: AudioLDM2Pipeline,
    source_waveform: np.ndarray,
    sample_rate: int,
    text_pos: TextBatch,
    text_neg: TextBatch,
    *,
    audio_length_in_s: float = 10.0,
    num_inference_steps: int = 50,
    guidance_scale: float = 9.5,
    ap_scale: float = 0.55,
    time_pool: int = 4,
    freq_pool: int = 4,
    use_audio_prompt: bool = True,
    seed: int = 0,
    materialize: bool = True,
) -> np.ndarray:
    """Host-facing SDEdit entry point (task template: style_transfer).

    ``materialize=False`` returns the (untrimmed) device array without the
    blocking device->host readback — same serving pattern as
    ``AudioLDM2Pipeline.generate``: dispatch several edits, then materialize
    all of them, overlapping each call's host work (source resample/fbank
    prep, output readback) with the previous call's device compute. The
    phase profile (docs/PERF.md r4) shows SDEdit's device time per clip is
    batch-saturated at 8, so overlap is where remaining throughput lives.
    """

    from ap_adapter_tpu.audio.dsp import resample
    from ap_adapter_tpu.pipeline.pipeline import _host_cpu_device

    c = pipe.config
    sr = c.mel.sample_rate
    # source prep on the host CPU backend — a TPU-placed resample would
    # queue behind the previous edit's in-flight denoise and stall the
    # pipelined-dispatch serving loop (see prepare_fbank)
    with jax.default_device(_host_cpu_device()):
        wav = jnp.asarray(np.atleast_2d(source_waveform).mean(axis=0), jnp.float32)
        if sample_rate != sr:
            wav = resample(wav, sample_rate, sr)

    b = text_pos.clap_ids.shape[0]
    # same length math as AudioLDM2Pipeline.generate (reference
    # pipeline_audioldm2.py:855-870): mel frames from the VOCODER's
    # upsample factor, rounded up to a whole latent — NOT from
    # mel.frames_per_second, which need not match the vocoder hop on
    # non-default configs
    mel_frames = pipe.latent_time_for_seconds(audio_length_in_s) * c.vae.scale_factor
    source = jnp.broadcast_to(wav[None], (b, wav.shape[-1]))

    fbank = pipe.prepare_fbank(np.asarray(wav), sr) if use_audio_prompt else None
    if fbank is not None:
        fbank = jnp.broadcast_to(fbank, (b, *fbank.shape[1:]))

    # the quant collection is geometry-dependent; make sure this latent
    # length has its prepared variables before tracing (pipeline.py)
    pipe._ensure_unet_quant(mel_frames // c.vae.scale_factor)

    # one jitted executable per shape bucket, cached on the pipeline —
    # re-jitting per call would re-trace the full graph every time
    key = ("sdedit", b, wav.shape[-1], fbank is not None,
           num_inference_steps, time_pool, freq_pool, mel_frames)
    if key not in pipe._jitted:
        pipe._jitted[key] = jax.jit(
            lambda params, rng, src, fb, tp, tn, g, s: sdedit_generate_waveform(
                pipe.modules, params, rng, src, fb, tp, tn,
                num_inference_steps=num_inference_steps,
                guidance_scale=g, ap_scale=s,
                time_pool=time_pool, freq_pool=freq_pool, mel_frames=mel_frames,
            )
        )
    fn = pipe._jitted[key]
    wavs = fn(
        pipe.params, jax.random.PRNGKey(seed), source, fbank, text_pos, text_neg,
        jnp.asarray(guidance_scale, jnp.float32), jnp.asarray(ap_scale, jnp.float32),
    )
    if not materialize:
        return wavs
    samples = int(audio_length_in_s * c.vocoder.sampling_rate)
    return np.asarray(wavs)[:, :samples]
