"""VGGish audio embedder — the PAPER-comparable FAD embedding space.

The reference evaluates with the ``frechet-audio-distance`` package
(/root/reference/requirements.txt), whose default embedder is VGGish
(torchvggish weights). The rebuild's primary FAD space is the parity-tested
CLAP audio tower (eval/metrics.clap_audio_embeddings — self-consistent but
not numerically comparable to the paper's tables). This module provides the
VGGish architecture + Google-exact log-mel front-end so that, given the
public torchvggish checkpoint (converted with
convert/torch_import.vggish_params), FAD numbers land in the SAME embedding
space as the paper's.

Front-end semantics follow Google's vggish ``mel_features.py`` exactly:
16 kHz mono, 25 ms / 10 ms Hann MAGNITUDE spectrogram (fft 512), a 64-band
125-7500 Hz mel matrix with triangles computed in MEL domain (NOT the
Hz-domain librosa triangles), log(mel + 0.01), framed into non-overlapping
0.96 s examples of [96, 64].
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.audio.dsp import frame_signal, hanning_window

# Google mel_features.py constants
_MEL_BREAK_HZ = 700.0
_MEL_HIGH_Q = 1127.0
SAMPLE_RATE = 16_000
WINDOW = 400  # 25 ms
HOP = 160  # 10 ms
FFT = 512
NUM_MELS = 64
FMIN, FMAX = 125.0, 7500.0
EXAMPLE_FRAMES = 96  # 0.96 s
LOG_OFFSET = 0.01


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    return _MEL_HIGH_Q * np.log(1.0 + np.asarray(f, np.float64) / _MEL_BREAK_HZ)


@functools.lru_cache(maxsize=2)
def vggish_mel_matrix() -> np.ndarray:
    """[1 + FFT//2, NUM_MELS] with mel-domain triangular weights.

    Mirrors ``spectrogram_to_mel_matrix``: bin 0 (DC) gets an all-zero row;
    slopes are computed against the bins' MEL positions, so triangle shapes
    differ from Hz-domain (librosa) filters between the same edges.
    """

    spec_hz = np.linspace(0.0, SAMPLE_RATE / 2.0, 1 + FFT // 2)
    spec_mel = _hz_to_mel(spec_hz[1:])
    edges = np.linspace(_hz_to_mel(np.array(FMIN)), _hz_to_mel(np.array(FMAX)),
                        NUM_MELS + 2)
    lower = (spec_mel[:, None] - edges[None, :-2]) / (edges[1:-1] - edges[:-2])
    upper = (edges[None, 2:] - spec_mel[:, None]) / (edges[2:] - edges[1:-1])
    weights = np.maximum(0.0, np.minimum(lower, upper))
    return np.vstack([np.zeros((1, NUM_MELS)), weights]).astype(np.float32)


def vggish_log_mel_examples(waveform: jnp.ndarray) -> jnp.ndarray:
    """waveform [..., N] at 16 kHz -> examples [..., num_examples, 96, 64].

    Google semantics: no centering/padding, magnitude (not power) STFT with
    a periodic Hann over 400 samples zero-padded to fft 512, mel matmul,
    log(mel + 0.01), then non-overlapping 96-frame example windows (the
    trailing partial example is dropped).
    """

    x = jnp.asarray(waveform, jnp.float32)
    frames = frame_signal(x, WINDOW, HOP)  # [..., T, 400]
    window = jnp.asarray(hanning_window(WINDOW, periodic=True), jnp.float32)
    frames = frames * window
    spectrum = jnp.fft.rfft(frames, n=FFT, axis=-1)
    mag = jnp.abs(spectrum)
    mel = mag @ jnp.asarray(vggish_mel_matrix())
    log_mel = jnp.log(mel + LOG_OFFSET)
    t = log_mel.shape[-2]
    n_ex = t // EXAMPLE_FRAMES
    log_mel = log_mel[..., : n_ex * EXAMPLE_FRAMES, :]
    return log_mel.reshape(*log_mel.shape[:-2], n_ex, EXAMPLE_FRAMES, NUM_MELS)


class VGGish(nn.Module):
    """torchvggish-compatible VGG stack -> 128-d embedding.

    Input examples [B, 96, 64, 1] NHWC. The flatten before the MLP follows
    torchvggish's ``permute(0, 2, 3, 1)`` + view — i.e. plain NHWC flatten —
    so converted ``embeddings.0`` weights apply directly.

    ``use_activation`` mirrors frechet-audio-distance's flag of the same
    name: the package's DEFAULT (False) strips the final ReLU from the
    embeddings head (``VGGish.postprocess`` path with use_activation=False
    pops ``embeddings.4``'s activation), so paper-comparable FAD runs on the
    raw ``fc_embed`` outputs. True restores torchvggish's post-ReLU output.
    """

    dtype: Any = jnp.float32
    use_activation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def conv(x, ch, name):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=name)(x)
            return nn.relu(x)

        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        x = x.astype(self.dtype)
        x = pool(conv(x, 64, "conv1"))
        x = pool(conv(x, 128, "conv2"))
        x = pool(conv(conv(x, 256, "conv3_1"), 256, "conv3_2"))
        x = pool(conv(conv(x, 512, "conv4_1"), 512, "conv4_2"))
        x = x.reshape(x.shape[0], -1)  # [B, 6*4*512]
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc2")(x))
        x = nn.Dense(128, dtype=self.dtype, name="fc_embed")(x)
        return nn.relu(x) if self.use_activation else x


class VggishEmbedder:
    """Duck-typed embedder for eval/runner._embed_wavs (the ``.embed``
    surface): frame-level (0.96 s example) VGGish embeddings concatenated
    across the clip set, matching frechet-audio-distance's
    ``get_embeddings`` (FAD statistics run over examples, not clips)."""

    def __init__(self, params):
        self.params = params

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "VggishEmbedder":
        """Load the public torchvggish ``.pt`` state dict (torch required)."""

        import torch

        from ap_adapter_tpu.convert.torch_import import vggish_params

        sd = torch.load(path, map_location="cpu")
        sd = sd.get("state_dict", sd)
        return cls(vggish_params(
            {k: v.detach().cpu().numpy() for k, v in sd.items()}))

    def embed(self, waveforms, sample_rate: int) -> np.ndarray:
        return vggish_clip_embeddings(self.params, waveforms, sample_rate)


def vggish_clip_embeddings(
    params, waveforms, sample_rate: int, use_activation: bool = False
) -> np.ndarray:
    """List of 1-D wavs (or one [B, N] array) -> [total_examples, 128].

    frechet-audio-distance semantics (``get_embeddings``): every clip's
    0.96 s examples are embedded and the example-level embeddings are
    CONCATENATED across the whole set — FAD mean/cov run over examples, not
    over per-clip pools — with the final ReLU stripped by default
    (use_activation=False). Paper-comparable FAD numbers require both."""

    import jax

    from ap_adapter_tpu.audio.dsp import resample

    model = VGGish(use_activation=use_activation)

    @jax.jit
    def embed(p, ex):
        return model.apply({"params": p}, ex)

    if isinstance(waveforms, np.ndarray) and waveforms.ndim == 2:
        waveforms = list(waveforms)
    out = []
    for wav in waveforms:
        w = jnp.asarray(np.atleast_2d(wav).mean(axis=0), jnp.float32)
        if sample_rate != SAMPLE_RATE:
            w = resample(w, sample_rate, SAMPLE_RATE)
        ex = vggish_log_mel_examples(w)[..., None]  # [E, 96, 64, 1]
        out.append(np.asarray(embed(params, ex), np.float32))
    return np.concatenate(out, axis=0)
