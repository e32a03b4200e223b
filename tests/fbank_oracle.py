"""Independently-authored direct-DFT Kaldi fbank oracle (VERDICT r4 item 9).

Written from the DOCUMENTED Kaldi/torchaudio.compliance.kaldi semantics —
feature_window.cc's ExtractWindow/ProcessWindow order and mel-banks.cc's
mel-domain triangles — NOT from ap_adapter_tpu/audio/fbank.py, and with a
deliberately different mechanism everywhere a choice existed:

- per-frame Python loop instead of a vectorized sliding window
- explicit complex-exponential DFT matrix instead of np.fft.rfft
- per-mel-bin triangle loop instead of a broadcast min(up, down)
- float64 throughout (the production path is fp32/MXU)

A shared misreading of the Kaldi spec would still pass, but any
implementation-level bug in the production fbank (framing off-by-one,
preemphasis edge sample, window symmetry, pad-then-window ordering, power
vs magnitude, mel edge handling, log floor) now needs the SAME bug written
twice through different code shapes to survive.

Kaldi semantics encoded (kaldi feat/feature-window.{h,cc}, feat/mel-banks.cc;
torchaudio.compliance.kaldi mirrors them):
  * snip_edges=True: frame i covers samples [i*shift, i*shift + window);
    num_frames = 1 + (N - window) // shift  (0 if N < window)
  * ProcessWindow order: dither (0 here) -> remove DC offset (subtract the
    frame mean) -> [log energy, unused] -> preemphasis with x[-1] := x[0]
    -> multiply by the window function
  * window_type='hanning': symmetric 0.5 - 0.5*cos(2*pi*n/(M-1))
  * zero-pad the WINDOWED frame to the next power of two (512 for 400)
  * power spectrum |X[k]|^2 for k = 0..fft/2 (use_power=True)
  * mel banks: 1127*ln(1 + f/700) scale, num_bins triangles with edges
    spaced uniformly in mel between low_freq and high_freq over bins
    0..fft/2-1, the nyquist bin carrying zero weight (vtln off)
  * log(max(mel, FLT_EPSILON))
"""

from __future__ import annotations

import numpy as np

FLT_EPS = float(np.finfo(np.float32).eps)


def _mel(f):
    return 1127.0 * np.log1p(np.asarray(f, np.float64) / 700.0)


def direct_fbank(
    wav,
    sample_rate: int = 16_000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    num_mel_bins: int = 128,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    use_power: bool = True,
) -> np.ndarray:
    """1-D waveform -> [num_frames, num_mel_bins] log-mel, float64."""

    x = np.asarray(wav, np.float64)
    assert x.ndim == 1
    window = int(sample_rate * frame_length_ms / 1000.0)
    shift = int(sample_rate * frame_shift_ms / 1000.0)
    fft = 1
    while fft < window:
        fft *= 2

    # symmetric Hann (kaldi "hanning")
    n = np.arange(window, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (window - 1))

    # explicit DFT matrix for bins 0..fft/2
    k = np.arange(fft // 2 + 1, dtype=np.float64)[:, None]
    t = np.arange(fft, dtype=np.float64)[None, :]
    dft = np.exp(-2j * np.pi * k * t / fft)  # [fft/2+1, fft]

    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    # mel triangles, one bin at a time
    mel_lo, mel_hi = float(_mel(low_freq)), float(_mel(high_freq))
    delta = (mel_hi - mel_lo) / (num_mel_bins + 1)
    bin_mels = _mel(np.arange(fft // 2) * (sample_rate / fft))  # nyquist excluded
    banks = np.zeros((num_mel_bins, fft // 2 + 1), np.float64)
    for m in range(num_mel_bins):
        left = mel_lo + m * delta
        mid = left + delta
        right = mid + delta
        for j, bm in enumerate(bin_mels):
            if left < bm < right:
                banks[m, j] = ((bm - left) / delta if bm <= mid
                               else (right - bm) / delta)

    n_frames = 0 if x.shape[0] < window else 1 + (x.shape[0] - window) // shift
    out = np.empty((n_frames, num_mel_bins), np.float64)
    for i in range(n_frames):
        frame = x[i * shift : i * shift + window].copy()
        if remove_dc_offset:
            frame -= frame.mean()
        if preemphasis != 0.0:
            shifted = np.empty_like(frame)
            shifted[0] = frame[0]
            shifted[1:] = frame[:-1]
            frame = frame - preemphasis * shifted
        frame *= win
        padded = np.zeros(fft, np.float64)
        padded[:window] = frame
        spec = dft @ padded
        power = spec.real**2 + spec.imag**2
        if not use_power:
            power = np.sqrt(power)
        out[i] = np.log(np.maximum(banks @ power, FLT_EPS))
    return out
