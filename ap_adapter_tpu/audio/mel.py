"""Tacotron-style 64-bin mel spectrogram for the VAE, in JAX.

Reproduces the ``audioldm`` package's ``TacotronSTFT`` numerics as used by the
reference trainer (train_apadapter_v2.py:280-336): 1024-pt STFT, hop 160,
periodic Hann, reflection center-padding, librosa slaney-scale/slaney-norm mel
filterbank (64 bins, 0-8 kHz), and dynamic-range compression ln(clamp(x,1e-5)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import MelConfig
from ap_adapter_tpu.audio.dsp import frame_signal, hanning_window, normalize_wav


def _hz_to_slaney_mel(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe = np.maximum(f, 1e-10)
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels)


def _slaney_mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def slaney_mel_banks(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') [1+n_fft//2, n_mels]."""

    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_min = _hz_to_slaney_mel(np.array(fmin))
    mel_max = _hz_to_slaney_mel(np.array(fmax))
    mel_pts = _slaney_mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)


def tacotron_mel(waveform: jnp.ndarray, config: MelConfig = MelConfig()) -> jnp.ndarray:
    """waveform [..., N] -> log-mel [..., frames, num_mel_bins].

    frames = 1 + N // hop (center-padded STFT).
    """

    n_fft = config.n_fft
    pad = n_fft // 2
    x = waveform.astype(jnp.float32)
    pad_spec = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    x = jnp.pad(x, pad_spec, mode="reflect")

    frames = frame_signal(x, n_fft, config.hop_length)
    window = np.zeros(n_fft, dtype=np.float64)
    w = hanning_window(config.win_length, periodic=True)
    off = (n_fft - config.win_length) // 2
    window[off : off + config.win_length] = w
    frames = frames * jnp.asarray(window, dtype=jnp.float32)

    spectrum = jnp.fft.rfft(frames, axis=-1)
    magnitude = jnp.sqrt(
        jnp.square(jnp.real(spectrum)) + jnp.square(jnp.imag(spectrum)) + 1e-12
    )

    banks = jnp.asarray(
        slaney_mel_banks(
            config.sample_rate, n_fft, config.num_mel_bins, config.mel_fmin, config.mel_fmax
        )
    )
    mel = jnp.einsum("...tf,fm->...tm", magnitude, banks, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, config.log_clamp))


@functools.partial(jax.jit, static_argnames=("config", "target_frames"))
def wav_to_vae_mel(
    waveform: jnp.ndarray,
    target_frames: int,
    config: MelConfig = MelConfig(),
) -> jnp.ndarray:
    """Full VAE mel front-end mirroring reference ``wav_to_mel``
    (train_apadapter_v2.py:308-336): normalize to peak 0.5, pad/cut the wave
    to target_frames*hop samples, STFT mel, pad/cut to target_frames.

    Returns [..., target_frames, num_mel_bins] (NHWC-ready; add channel axis
    downstream).
    """

    segment = target_frames * config.hop_length
    x = normalize_wav(waveform)
    n = x.shape[-1]
    if n < segment:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, segment - n)]
        x = jnp.pad(x, pad)
    elif n > segment:
        x = x[..., :segment]

    mel = tacotron_mel(x, config)
    t = mel.shape[-2]
    if t < target_frames:
        pad = [(0, 0)] * (mel.ndim - 2) + [(0, target_frames - t), (0, 0)]
        mel = jnp.pad(mel, pad)
    elif t > target_frames:
        mel = mel[..., :target_frames, :]
    return mel


# ---------------------------------------------------------------------------
# CLAP 48 kHz log-mel front-end (transformers ClapFeatureExtractor semantics)
# ---------------------------------------------------------------------------


def _hz_to_htk_mel(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _htk_mel_to_hz(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_banks(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
    htk: bool = False, norm_slaney: bool = True,
) -> np.ndarray:
    """Generic triangular mel filterbank [1+n_fft//2, n_mels] (librosa/HTK)."""

    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    to_mel = _hz_to_htk_mel if htk else _hz_to_slaney_mel
    from_mel = _htk_mel_to_hz if htk else _slaney_mel_to_hz
    pts = from_mel(np.linspace(to_mel(np.array(fmin)), to_mel(np.array(fmax)), n_mels + 2))

    fdiff = np.diff(pts)
    ramps = pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm_slaney:
        enorm = 2.0 / (pts[2 : n_mels + 2] - pts[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(np.float32)


def clap_log_mel(
    waveform: jnp.ndarray,
    sr: int = 48_000,
    n_fft: int = 1024,
    hop: int = 480,
    n_mels: int = 64,
    fmin: float = 0.0,
    fmax: float = 14_000.0,
    htk: bool = False,
) -> jnp.ndarray:
    """waveform [..., N] at 48 kHz -> dB log-mel [..., frames, n_mels].

    Matches transformers ``ClapFeatureExtractor._np_extract_fbank_features``:
    centered power spectrogram with periodic Hann, mel matmul, then
    ``10*log10(max(x, 1e-10))``. Slaney filters (htk=False) correspond to the
    extractor's non-fusion ("rand_trunc") path; htk=True to the fusion path.
    """

    pad = n_fft // 2
    x = waveform.astype(jnp.float32)
    pad_spec = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    x = jnp.pad(x, pad_spec, mode="reflect")
    frames = frame_signal(x, n_fft, hop)
    window = jnp.asarray(hanning_window(n_fft, periodic=True), dtype=jnp.float32)
    spectrum = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.square(jnp.real(spectrum)) + jnp.square(jnp.imag(spectrum))
    banks = jnp.asarray(mel_banks(sr, n_fft, n_mels, fmin, fmax, htk=htk, norm_slaney=not htk))
    mel = jnp.einsum("...tf,fm->...tm", power, banks, preferred_element_type=jnp.float32)
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
