"""ap_adapter_tpu — a TPU-native audio-prompt-adapter framework for AudioLDM2.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of AP-adapter
(fundwotsai2001/AP-adapter, ISMIR 2024): IP-adapter-style decoupled audio
cross-attention bolted onto the AudioLDM2 latent-diffusion UNet, conditioned on
pooled AudioMAE embeddings of a reference clip, with text conditioning via
CLAP + Flan-T5 -> projection -> GPT-2 "language of audio" tokens.

Everything is TPU-first:
  * all compute-path models are Flax modules compiled by XLA (bf16 on the MXU),
  * the 50-step DDIM denoise loop is a single jitted ``lax.scan``,
  * the decoupled dual-KV cross-attention and the AudioMAE avg+max pooling have
    fused Pallas kernels,
  * training is ``pjit``-sharded data parallel over a ``jax.sharding.Mesh``.

Layout:
  audio/     wav IO + DSP front-ends (kaldi fbank, Tacotron mel, resampler)
  models/    Flax models: AudioMAE, CLAP text, T5, GPT-2, projection, UNet,
             VAE, HiFi-GAN vocoder
  ops/       attention / pooling / stft primitives (XLA + Pallas)
  adapter/   decoupled-KV adapter parameter handling + torch-interop IO
  diffusion/ DDIM scheduler + sampling scan
  pipeline/  user-facing task API (timbre/style transfer, accompaniment)
  train/     pjit data-parallel adapter finetuning
  parallel/  mesh + sharding rules
  convert/   PyTorch checkpoint -> param pytree conversion
  utils/     config, checkpointing, logging, profiling
"""

__version__ = "0.1.0"

from ap_adapter_tpu import configs  # noqa: F401
