"""Shared DSP primitives: framing, windows, polyphase resampling.

TPU-first design notes:
  * Framing uses ``lax.conv_general_dilated_patches`` (XLA's native sliding
    window) rather than gathers — it lowers to efficient windowed loads.
  * Resampling is a strided 1-D convolution with a precomputed polyphase sinc
    kernel (one matmul-like conv per call; no Python loops over samples).
  * Filter/window tables are built host-side in float64 numpy (once, cached)
    and baked into the jitted graph as fp32 constants.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def hanning_window(n: int, periodic: bool = False) -> np.ndarray:
    """Hann window. Kaldi uses the symmetric form 0.5-0.5cos(2*pi*k/(n-1));
    Tacotron/scipy ``get_window('hann', n, fftbins=True)`` uses the periodic
    form 0.5-0.5cos(2*pi*k/n)."""

    k = np.arange(n, dtype=np.float64)
    denom = n if periodic else (n - 1)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / denom)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice ``x`` [..., N] into overlapping frames [..., num_frames, frame_length].

    num_frames = 1 + (N - frame_length) // hop  (snip-edges semantics).
    """

    *lead, n = x.shape
    num_frames = 1 + (n - frame_length) // hop
    flat = x.reshape((-1, 1, n))
    # conv_general_dilated_patches over a 1-D spatial dim extracts the frames.
    patches = jax.lax.conv_general_dilated_patches(
        flat,
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, frame_length, num_frames]
    patches = jnp.transpose(patches, (0, 2, 1))
    return patches.reshape(tuple(lead) + (num_frames, frame_length))


# ---------------------------------------------------------------------------
# Polyphase resampling (torchaudio.functional.resample semantics)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int]:
    """Polyphase windowed-sinc kernel, matching torchaudio's
    ``sinc_interp_hann`` resampler (reference calls
    ``torchaudio.functional.resample`` at audio_encoder/AudioMAE.py:361-363).

    Returns (kernel [new_freq, width*2 + orig_freq], width).
    """

    g = math.gcd(orig_freq, new_freq)
    orig_freq //= g
    new_freq //= g

    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)

    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    scale = base_freq / orig_freq
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * scale
    return kernel.astype(np.float32), width


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample the last axis of ``x`` from orig_freq to new_freq."""

    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g

    kernel, width = _sinc_resample_kernel(int(orig_freq), int(new_freq))
    *lead, n = x.shape
    target_len = int(math.ceil(new * n / orig))

    flat = x.reshape((-1, 1, n)).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (width, width + orig)))
    out = jax.lax.conv_general_dilated(
        flat,
        kernel[:, None, :],  # [out_ch=new, in_ch=1, W]
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new, frames]
    out = jnp.transpose(out, (0, 2, 1)).reshape((flat.shape[0], -1))
    out = out[:, :target_len]
    return out.reshape(tuple(lead) + (target_len,))


# ---------------------------------------------------------------------------
# Waveform normalization (audioldm pkg semantics; train_apadapter_v2.py:253-269)
# ---------------------------------------------------------------------------


def normalize_wav(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Mean-center and scale so the waveform peak is 0.5.

    Composition of the audioldm ``normalize_wav`` and the reference
    ``read_wav_file`` re-normalization (train_apadapter_v2.py:263-268): the
    net effect on non-silent audio is mean removal + peak at 0.5.
    """

    x = x - jnp.mean(x, axis=-1, keepdims=True)
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return 0.5 * x / jnp.maximum(peak, eps)


def pad_wav(x: np.ndarray, segment_length: int) -> np.ndarray:
    """Zero-pad (end) or cut the last axis to ``segment_length``."""

    n = x.shape[-1]
    if n == segment_length:
        return x
    if n > segment_length:
        return x[..., :segment_length]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, segment_length - n)]
    return np.pad(x, pad)
