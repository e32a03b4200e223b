"""AudioLDM v1 pipeline: CLAP-only text-to-audio generation.

Equivalent of the reference's (vestigial, unused-by-entry-points)
``pipeline/pipeline_audioldm.py``: the normalized CLAP text embedding
conditions the UNet as a "simple_projection" class label concatenated with
the time embedding (reference pipeline_audioldm.py:563-564:
``encoder_hidden_states=None, class_labels=prompt_embeds``); transformer
blocks run pure self-attention. Shares the DDIM scan, VAE and vocoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import PipelineConfig, UNetConfig
from ap_adapter_tpu.diffusion.sampling import ddim_sample_loop
from ap_adapter_tpu.models.clap import ClapTextEncoder
from ap_adapter_tpu.models.unet import AudioLDM2UNet
from ap_adapter_tpu.models.vae import AutoencoderKL
from ap_adapter_tpu.models.vocoder import HiFiGAN
from ap_adapter_tpu.pipeline.pipeline import TextBatch


def audioldm_v1_unet_config(base: UNetConfig = UNetConfig(), clap_dim: int = 512) -> UNetConfig:
    """A v1-style UNet: one self-attention transformer group per layer,
    CLAP class embedding concatenated with the time embedding."""

    import dataclasses

    return dataclasses.replace(
        base,
        in_channels=8,
        out_channels=8,
        cross_attention_dims=(None,),
        class_embed_dim=clap_dim,
        class_embeddings_concat=True,
    )


class AudioLDMv1Pipeline:
    """Text -> waveform with CLAP-only conditioning (AudioLDM v1 semantics)."""

    def __init__(self, config: PipelineConfig, unet_config: UNetConfig, params, device=None):
        self.config = config
        self.unet_config = unet_config
        self.clap = ClapTextEncoder(config.clap, dtype=config.dtype)
        self.unet = AudioLDM2UNet(unet_config, dtype=config.dtype)
        self.vae = AutoencoderKL(config.vae, dtype=config.dtype)
        self.vocoder = HiFiGAN(config.vocoder, dtype=config.dtype)
        self.params = jax.device_put(params, device or jax.devices()[0])
        self._jitted = {}

    @classmethod
    def from_random(cls, config: PipelineConfig, seed: int = 0) -> "AudioLDMv1Pipeline":
        from ap_adapter_tpu.utils.init import fast_init

        ucfg = audioldm_v1_unet_config(
            UNetConfig(
                block_out_channels=config.unet.block_out_channels,
                down_block_has_attn=config.unet.down_block_has_attn,
                up_block_has_attn=config.unet.up_block_has_attn,
                layers_per_block=config.unet.layers_per_block,
                transformer_layers_per_block=1,
                num_attention_heads=config.unet.num_attention_heads,
                norm_num_groups=config.unet.norm_num_groups,
            ),
            clap_dim=config.clap.projection_dim,
        )
        clap = ClapTextEncoder(config.clap, dtype=config.dtype)
        unet = AudioLDM2UNet(ucfg, dtype=config.dtype)
        vae = AutoencoderKL(config.vae, dtype=config.dtype)
        voc = HiFiGAN(config.vocoder, dtype=config.dtype)

        params = {
            "clap": fast_init(lambda k: clap.init(
                k, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)), seed=seed)["params"],
            "unet": fast_init(lambda k: unet.init(
                k, jnp.zeros((1, 8, 8, ucfg.in_channels)), jnp.zeros((1,)),
                jnp.zeros((1, 1, 8)), jnp.zeros((1, 1, 8)), None, 0.0,
                jnp.zeros((1, config.clap.projection_dim))), seed=seed + 1)["params"],
            "vae": fast_init(lambda k: vae.init(
                k, jnp.zeros((1, 4 * config.vae.scale_factor, 4 * config.vae.scale_factor, 1)), k),
                seed=seed + 2)["params"],
            "vocoder": fast_init(lambda k: voc.init(
                k, jnp.zeros((1, 8, config.vocoder.model_in_dim))), seed=seed + 3)["params"],
        }
        return cls(config, ucfg, params)

    def generate(
        self,
        text_pos: TextBatch,
        text_neg: TextBatch,
        *,
        audio_length_in_s: float = 10.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 2.5,
        seed: int = 0,
    ) -> np.ndarray:
        c = self.config
        frame_s = c.vocoder.upsample_factor / c.vocoder.sampling_rate
        height = int(audio_length_in_s / frame_s)
        scale = c.vae.scale_factor
        latent_time = ((height + scale - 1) // scale)
        latent_freq = c.vocoder.model_in_dim // scale
        b = text_pos.clap_ids.shape[0]

        key = (b, latent_time, num_inference_steps)
        if key not in self._jitted:
            def fn(params, rng, tp, tn, g):
                neg = self.clap.apply({"params": params["clap"]}, tn.clap_ids, tn.clap_mask)
                pos = self.clap.apply({"params": params["clap"]}, tp.clap_ids, tp.clap_mask)
                class_labels = jnp.concatenate([neg, pos], axis=0)

                latents = jax.random.normal(
                    rng, (b, latent_time, latent_freq, self.unet_config.in_channels), jnp.float32
                )
                dummy = jnp.zeros((2 * b, 1, 8), c.dtype)

                def unet_fn(x, t):
                    ts = jnp.broadcast_to(t.astype(jnp.float32), (x.shape[0],))
                    return self.unet.apply(
                        {"params": params["unet"]}, x.astype(c.dtype), ts,
                        dummy, dummy, None, 0.0, class_labels,
                    )

                latents = ddim_sample_loop(
                    unet_fn, latents, c.scheduler, num_inference_steps, g, do_cfg=True
                )
                mel = self.vae.apply(
                    {"params": params["vae"]},
                    (latents / c.vae.scaling_factor).astype(c.dtype),
                    method=AutoencoderKL.decode,
                )
                return self.vocoder.apply(
                    {"params": params["vocoder"]}, mel[..., 0].astype(jnp.float32)
                ).astype(jnp.float32)

            self._jitted[key] = jax.jit(fn)

        wav = self._jitted[key](
            self.params, jax.random.PRNGKey(seed), text_pos, text_neg,
            jnp.asarray(guidance_scale, jnp.float32),
        )
        samples = int(audio_length_in_s * c.vocoder.sampling_rate)
        return np.asarray(wav)[:, :samples]
