"""SDEdit style-transfer pipeline on the tiny config (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ap_adapter_tpu.configs import tiny_pipeline_config, SchedulerConfig
from ap_adapter_tpu.diffusion.sampling import sdedit_timesteps
from ap_adapter_tpu.diffusion.ddim import inference_timesteps
from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline, TextBatch
from ap_adapter_tpu.pipeline.style_transfer import generate_style_transfer


def test_sdedit_timesteps_truncation():
    cfg = SchedulerConfig()
    full = inference_timesteps(cfg, 50)
    # reference keeps the last steps - steps//4*2 = 26 steps
    kept = sdedit_timesteps(cfg, 50, 50 - 50 // 4 * 2)
    assert len(kept) == 26
    np.testing.assert_array_equal(kept, full[24:])


def test_style_transfer_end_to_end(rng):
    import dataclasses

    base = tiny_pipeline_config()
    # make the mel frame rate consistent with the tiny vocoder (16x @ 16 kHz
    # -> 1000 frames/s) so the SDEdit latent covers the full clip; the real
    # config has ~102.4 vs 100 fps, matching the reference's own 1024/1000
    # training/inference mismatch.
    cfg = dataclasses.replace(
        base, mel=dataclasses.replace(base.mel, frames_per_second=1000.0)
    )
    pipe = AudioLDM2Pipeline.from_random(cfg, seed=0)

    b = 1
    def text():
        return TextBatch(
            clap_ids=jnp.asarray(rng.integers(2, cfg.clap.vocab_size, (b, 6)), jnp.int32),
            clap_mask=jnp.ones((b, 6), jnp.int32),
            t5_ids=jnp.asarray(rng.integers(2, cfg.t5.vocab_size, (b, 5)), jnp.int32),
            t5_mask=jnp.ones((b, 5), jnp.int32),
        )

    # tiny AudioMAE wants (64, 32) fbank — skip the audio prompt branch here
    source = (rng.standard_normal(3200) * 0.3).astype(np.float32)  # 0.2 s @16k
    tp, tn = text(), text()
    wavs = generate_style_transfer(
        pipe, source, 16000, tp, tn,
        audio_length_in_s=0.2, num_inference_steps=8,
        guidance_scale=3.0, ap_scale=0.5, time_pool=2, freq_pool=2,
        use_audio_prompt=False, seed=0,
    )
    assert wavs.shape == (1, int(0.2 * cfg.vocoder.sampling_rate))
    assert np.all(np.isfinite(wavs))

    # materialize=False (pipelined-dispatch serving pattern): same values,
    # untrimmed, no host transfer forced inside the call
    lazy = generate_style_transfer(
        pipe, source, 16000, tp, tn,
        audio_length_in_s=0.2, num_inference_steps=8,
        guidance_scale=3.0, ap_scale=0.5, time_pool=2, freq_pool=2,
        use_audio_prompt=False, seed=0, materialize=False,
    )
    assert not isinstance(lazy, np.ndarray)
    np.testing.assert_allclose(np.asarray(lazy)[:, :wavs.shape[1]], wavs,
                               rtol=0, atol=0)


def test_audioldm_v1_pipeline(rng):
    """CLAP-only v1 pipeline generates finite audio (tiny config)."""

    from ap_adapter_tpu.pipeline.audioldm_v1 import AudioLDMv1Pipeline

    cfg = tiny_pipeline_config()
    pipe = AudioLDMv1Pipeline.from_random(cfg, seed=0)
    b = 1
    def text():
        return TextBatch(
            clap_ids=jnp.asarray(rng.integers(2, cfg.clap.vocab_size, (b, 6)), jnp.int32),
            clap_mask=jnp.ones((b, 6), jnp.int32),
            t5_ids=jnp.zeros((b, 1), jnp.int32),
            t5_mask=jnp.ones((b, 1), jnp.int32),
        )
    wav = pipe.generate(text(), text(), audio_length_in_s=0.2, num_inference_steps=2)
    assert wav.shape == (1, int(0.2 * cfg.vocoder.sampling_rate))
    assert np.all(np.isfinite(wav))
