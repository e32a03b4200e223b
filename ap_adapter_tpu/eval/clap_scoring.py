"""CLAP text-audio similarity scoring (reference score_waveforms parity).

The reference re-ranks generated waveforms with ClapModel similarity when
``num_waveforms_per_prompt > 1`` (pipeline_audioldm2.py:592-614): resample to
48 kHz, CLAP feature extractor, audio embeds vs text embeds, argsort. Here
both towers run in JAX (models/clap.py + models/clap_audio.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.audio.dsp import resample
from ap_adapter_tpu.audio.mel import clap_log_mel
from ap_adapter_tpu.configs import ClapAudioConfig, ClapTextConfig
from ap_adapter_tpu.models.clap import ClapTextEncoder
from ap_adapter_tpu.models.clap_audio import ClapAudioTower


class ClapScorer:
    """Text-audio similarity with CLAP. Params:
    {"text": <ClapTextEncoder params>, "audio": <ClapAudioTower params>}."""

    def __init__(
        self,
        text_config: ClapTextConfig,
        audio_config: ClapAudioConfig,
        params,
    ):
        self.text_config = text_config
        self.audio_config = audio_config
        self.params = jax.device_put(params)  # commit to device once
        self.text_model = ClapTextEncoder(text_config)
        self.audio_model = ClapAudioTower(audio_config)
        self._audio_fn = jax.jit(
            lambda p, feats: self.audio_model.apply({"params": p}, feats)
        )
        self._text_fn = jax.jit(
            lambda p, ids, mask: self.text_model.apply({"params": p}, ids, mask)
        )

    def text_features(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        return np.asarray(self._text_fn(self.params["text"], jnp.asarray(input_ids),
                                        jnp.asarray(attention_mask)))

    def audio_features(self, waveform: np.ndarray, sample_rate: int) -> np.ndarray:
        """waveform [N] or [B, N] -> normalized audio embeds [B, proj_dim]."""

        c = self.audio_config
        wav = jnp.asarray(np.atleast_2d(waveform), jnp.float32)
        if sample_rate != c.sampling_rate:
            wav = resample(wav, sample_rate, c.sampling_rate)
        max_len = c.max_length_s * c.sampling_rate
        n = wav.shape[-1]
        if n < max_len:  # "repeatpad": tile then zero-pad (HF non-fusion path)
            reps = max_len // n
            wav = jnp.tile(wav, (1, reps))
            wav = jnp.pad(wav, ((0, 0), (0, max_len - wav.shape[-1])))
        else:
            wav = wav[:, :max_len]
        mel = clap_log_mel(
            wav, sr=c.sampling_rate, n_fft=c.n_fft, hop=c.hop_length,
            n_mels=c.num_mel_bins, fmin=c.frequency_min, fmax=c.frequency_max,
        )
        return np.asarray(self._audio_fn(self.params["audio"], mel[:, None, :, :]))

    def rank(
        self,
        text_input_ids: np.ndarray,
        text_attention_mask: np.ndarray,
        waveforms: Sequence[np.ndarray],
        sample_rate: int,
    ) -> np.ndarray:
        """Indices of waveforms sorted by CLAP similarity, best first."""

        text = self.text_features(text_input_ids, text_attention_mask)[0]
        audio = self.audio_features(np.stack(list(waveforms)), sample_rate)
        sims = audio @ text
        return np.argsort(sims)[::-1]
