"""Wav file IO.

Pure-Python host-side IO (scipy) with an optional C++ fast decoder for the
training data pipeline (native/wavio.cpp, loaded via ctypes when built).
The reference uses torchaudio.load / scipy.io.wavfile.write
(inference.py:80-81, train_apadapter_v2.py:253-256).
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_NATIVE = None


def _native_lib():
    global _NATIVE
    if _NATIVE is None:
        path = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libwavio.so")
        path = os.path.abspath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.wavio_read_info.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.wavio_read_info.restype = ctypes.c_int32
                lib.wavio_read_f32.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                ]
                lib.wavio_read_f32.restype = ctypes.c_int64
                lib.wavio_read_batch_f32.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int32,
                ]
                lib.wavio_read_batch_f32.restype = ctypes.c_int32
                _NATIVE = lib
            except OSError:
                _NATIVE = False
        else:
            _NATIVE = False
    return _NATIVE or None


def load_wav(path: str, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Read a wav file -> (float32 waveform [channels?, N] in [-1, 1], sr).

    Uses the native decoder when built, else scipy.
    """

    lib = _native_lib()
    if lib is not None:
        frames = ctypes.c_int64()
        channels = ctypes.c_int32()
        sr = ctypes.c_int32()
        ok = lib.wavio_read_info(path.encode(), ctypes.byref(frames), ctypes.byref(channels), ctypes.byref(sr))
        if ok == 0:
            buf = np.empty(frames.value * channels.value, dtype=np.float32)
            got = lib.wavio_read_f32(path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size)
            if got == buf.size:
                data = buf.reshape(frames.value, channels.value)
                if mono:
                    data = data.mean(axis=1)
                else:
                    data = data.T
                return np.ascontiguousarray(data), sr.value

    from scipy.io import wavfile

    sr_, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1) if mono else data.T
    return data, int(sr_)


def load_wav_batch(
    paths, capacity: int, n_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a batch of wavs in parallel worker threads (native C++ pool).

    Returns ``(wavs [n, capacity] float32 mono zero-padded, frames [n]
    decoded pre-pad lengths, sample_rates [n])``. Falls back to sequential
    :func:`load_wav` when the native library isn't built. Mirrors the
    reference's torchaudio decode in ``--dataloader_num_workers`` worker
    processes (train_apadapter_v2.py:253-256); resampling stays upstream.
    """

    paths = list(paths)
    n = len(paths)
    out = np.zeros((n, capacity), dtype=np.float32)
    frames = np.zeros(n, dtype=np.int64)
    srs = np.zeros(n, dtype=np.int32)

    lib = _native_lib()
    if lib is not None and hasattr(lib, "wavio_read_batch_f32") and n:
        status = np.zeros(n, dtype=np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.wavio_read_batch_f32(
            c_paths,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            capacity,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads,
        )
        bad = np.nonzero(status < 0)[0]
    else:
        bad = range(n)

    for i in bad:  # scipy fallback, per file
        wav, sr = load_wav(paths[i])
        m = min(wav.shape[-1], capacity)
        out[i, :m] = wav[:m]
        out[i, m:] = 0.0
        frames[i] = m
        srs[i] = sr
    return out, frames, srs


def save_wav(path: str, waveform: np.ndarray, sample_rate: int = 16_000) -> None:
    """Write float32 [-1,1] (or int16) audio to a 16-bit PCM wav file."""

    from scipy.io import wavfile

    data = np.asarray(waveform)
    if data.dtype != np.int16:
        data = np.clip(data, -1.0, 1.0)
        data = (data * 32767.0).astype(np.int16)
    wavfile.write(path, sample_rate, data)
