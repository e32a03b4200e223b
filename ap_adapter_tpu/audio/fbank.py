"""Kaldi-compatible 128-bin log-mel filterbank in JAX.

Reproduces ``torchaudio.compliance.kaldi.fbank`` for the exact argument set the
reference uses (audio_encoder/AudioMAE.py:368-377): htk_compat=True,
use_energy=False, window_type='hanning', num_mel_bins=128, dither=0.0,
frame_shift=10, snip_edges default (True).

The hot path is one jitted graph: frame extraction (XLA sliding window), DC
removal, pre-emphasis, symmetric Hann window, zero-pad to 512, rFFT power
spectrum, and a [frames,257]x[257,128] mel matmul that lands on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import FbankConfig
from ap_adapter_tpu.audio.dsp import frame_signal, hanning_window

_F32_EPS = float(np.finfo(np.float32).eps)


def _mel_scale(freq: np.ndarray) -> np.ndarray:
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=8)
def kaldi_mel_banks(
    num_bins: int,
    padded_window_size: int,
    sample_rate: int,
    low_freq: float,
    high_freq: float,
) -> np.ndarray:
    """Kaldi triangular mel filterbank matrix [num_fft_bins+1, num_bins].

    Matches kaldi's GetMelBanks (no vtln): triangles are linear in the
    1127*ln(1+f/700) mel domain; the last FFT row (nyquist) is zero.
    """

    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    num_fft_bins = padded_window_size // 2

    fft_bin_width = sample_rate / padded_window_size
    mel_low = _mel_scale(np.array(low_freq))
    mel_high = _mel_scale(np.array(high_freq))
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.arange(num_bins, dtype=np.float64)[:, None]
    left = mel_low + bins * mel_delta
    center = mel_low + (bins + 1.0) * mel_delta
    right = mel_low + (bins + 2.0) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)[None, :]
    mel = _mel_scale(freqs)

    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))

    # append the nyquist column as zeros (torchaudio pads the same way)
    weights = np.concatenate([weights, np.zeros((num_bins, 1))], axis=1)
    return weights.T.astype(np.float32)  # [num_fft_bins+1, num_bins]


def kaldi_fbank(waveform: jnp.ndarray, config: FbankConfig = FbankConfig()) -> jnp.ndarray:
    """waveform [..., N] at config.sample_rate -> log-mel fbank [..., frames, bins]."""

    frame_len = config.frame_length
    hop = config.frame_shift
    padded = config.padded_window_size

    frames = frame_signal(waveform.astype(jnp.float32), frame_len, hop)

    if config.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    if config.preemphasis != 0.0:
        # kaldi: x[i] -= coeff * x[i-1], with x[-1] := x[0]
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - config.preemphasis * prev

    window = jnp.asarray(hanning_window(frame_len, periodic=False), dtype=jnp.float32)
    frames = frames * window

    if padded > frame_len:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, padded - frame_len)]
        frames = jnp.pad(frames, pad)

    spectrum = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(jnp.real(spectrum)) + jnp.square(jnp.imag(spectrum))
    if not config.use_power:
        power = jnp.sqrt(power)

    banks = jnp.asarray(
        kaldi_mel_banks(
            config.num_mel_bins, padded, config.sample_rate, config.low_freq, config.high_freq
        )
    )
    mel = jnp.einsum(
        "...tf,fm->...tm", power, banks, preferred_element_type=jnp.float32
    )
    return jnp.log(jnp.maximum(mel, _F32_EPS))


@functools.partial(jax.jit, static_argnames=("config",))
def audiomae_fbank(waveform: jnp.ndarray, config: FbankConfig = FbankConfig()) -> jnp.ndarray:
    """Full AudioMAE front-end: mean-subtract, fbank, pad/cut to
    ``config.target_frames``, AudioSet normalization.

    Mirrors reference ``extract_kaldi_fbank_feature``
    (audio_encoder/AudioMAE.py:356-394). Input must already be 16 kHz.
    Returns [..., target_frames, num_mel_bins].
    """

    waveform = waveform - jnp.mean(waveform, axis=-1, keepdims=True)
    fbank = kaldi_fbank(waveform, config)

    n = fbank.shape[-2]
    target = config.target_frames
    if n < target:
        pad = [(0, 0)] * (fbank.ndim - 2) + [(0, target - n), (0, 0)]
        fbank = jnp.pad(fbank, pad)
    elif n > target:
        fbank = fbank[..., :target, :]

    return (fbank - config.norm_mean) / (config.norm_std * 2.0)
