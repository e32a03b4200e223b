"""Quality side of the bf16-GroupNorm-statistics A/B (VERDICT r4 item 4).

AP_GN_BF16=1 drops the fp32 promotion feeding the UNet GroupNorm reduces
(models/unet_blocks._GN_F32_STATS). The throughput side is bench.py with the
flag on/off; this script measures the OUTPUT delta against the PARITY.md
end-to-end tolerance row (mean abs log-mel diff < 0.1, cosine > 0.99):

    python scripts/ab_gn_quality.py --out /tmp/gn_fp32.npz            # default
    AP_GN_BF16=1 python scripts/ab_gn_quality.py --out /tmp/gn_bf16.npz
    python scripts/ab_gn_quality.py --compare /tmp/gn_fp32.npz /tmp/gn_bf16.npz

Full config, batch 2, 50 DDIM steps, fixed seeds — the same composed graph
bench.py times.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def generate(out_path: str) -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from ap_adapter_tpu.configs import PipelineConfig
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline
    from ap_adapter_tpu.pipeline.tokenize import make_text_batch

    config = PipelineConfig()
    pipe = AudioLDM2Pipeline.from_random(config, seed=0)
    b = 2
    pos = make_text_batch(config, ["a recording of a violin solo"] * b, None)
    neg = make_text_batch(config, ["low quality"] * b, None)
    rng = np.random.default_rng(11)
    fbank = jnp.asarray(rng.standard_normal(
        (b, config.fbank.target_frames, config.fbank.num_mel_bins)
    ).astype(np.float32))
    wav = pipe.generate(pos, neg, fbank, audio_length_in_s=10.0,
                        num_inference_steps=50, guidance_scale=7.5,
                        ap_scale=0.5, time_pool=2, freq_pool=2, seed=0)
    np.savez_compressed(out_path, wav=np.asarray(wav, np.float32),
                        gn_bf16=os.environ.get("AP_GN_BF16", "0"))
    print(f"wrote {out_path} wav={np.asarray(wav).shape}")


def compare(a_path: str, b_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ap_adapter_tpu.audio.mel import tacotron_mel
    from ap_adapter_tpu.configs import MelConfig

    a = np.load(a_path)["wav"]
    b = np.load(b_path)["wav"]
    assert a.shape == b.shape, (a.shape, b.shape)
    mel_a = np.asarray(tacotron_mel(jnp.asarray(a), MelConfig()))
    mel_b = np.asarray(tacotron_mel(jnp.asarray(b), MelConfig()))
    diff = np.abs(mel_a - mel_b)
    cos = float(np.sum(mel_a * mel_b) /
                (np.linalg.norm(mel_a) * np.linalg.norm(mel_b) + 1e-12))
    wav_corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    print(f"mean abs log-mel diff: {diff.mean():.5f}  (tolerance row: < 0.1)")
    print(f"max  abs log-mel diff: {diff.max():.5f}")
    print(f"log-mel cosine:        {cos:.6f}    (tolerance row: > 0.99)")
    print(f"waveform corr:         {wav_corr:.6f}")
    ok = diff.mean() < 0.1 and cos > 0.99
    print("PARITY ROW:", "PASS" if ok else "FAIL")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="")
    p.add_argument("--compare", nargs=2, default=None)
    args = p.parse_args()
    if args.compare:
        compare(*args.compare)
    elif args.out:
        generate(args.out)
    else:
        p.error("pass --out or --compare")


if __name__ == "__main__":
    main()
