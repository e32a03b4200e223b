"""Training data pipeline: AudioSet manifest dataset + on-device collate.

The reference pipeline (train_apadapter_v2.py:347-480) computes the VAE mel
per item in CPU dataloader workers and runs fbank/AudioMAE/text encoders in a
CUDA collate — a real throughput bottleneck (SURVEY §3.5). Here the host only
decodes + resamples wavs (optionally via the native C++ decoder); ALL DSP and
frozen-encoder work (Tacotron mel, kaldi fbank, CLAP/T5/GPT-2, AudioMAE with
random pooling, CFG dropout) runs in one jitted device function per pooling
bucket.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.audio.dsp import resample
from ap_adapter_tpu.audio.fbank import audiomae_fbank
from ap_adapter_tpu.audio.io import load_wav, load_wav_batch
from ap_adapter_tpu.audio.mel import wav_to_vae_mel
from ap_adapter_tpu.pipeline.pipeline import PipelineModules, TextBatch
from ap_adapter_tpu.pipeline.tokenize import HFTokenizers, make_text_batch

# reference train_apadapter_v2.py:404-419
AUDIOSET_TEMPLATES_SMALL = [
    "a recording of a {}",
    "a {} recording",
    "a synthesized {} audio",
    "a cropped recording of the {}",
    "the recording of a {}",
    "my {} recording",
    "the {} recording",
    "a rendition of the {}",
    "a synthesized {} rendition",
    "the sound of a {}",
    "the sound of {}",
    "the voice of {}",
    "the voice of a {}",
    "a voice of the {}",
    "a synthesized {} voice",
]

POOL_CHOICES = (1, 2, 4, 8)  # reference train_apadapter_v2.py:445-447


class AudioSetDataset:
    """(caption, waveform) pairs from an AudioSet-style JSON manifest.

    Manifest format (reference AudioInversionDataset, train_apadapter_v2.py:
    347-425): {"data": [{"wav": <path>, "labels": "a, b"}, ...]}; captions are
    a random template over the comma-joined labels.
    """

    def __init__(self, manifest_path: str, data_root: str = "", duration_s: float = 10.0,
                 sample_rate: int = 16_000, seed: int = 0):
        with open(manifest_path) as f:
            manifest = json.load(f)
        self.items = manifest["data"] if isinstance(manifest, dict) else manifest
        self.data_root = data_root
        self.duration_s = duration_s
        self.sample_rate = sample_rate
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Tuple[str, np.ndarray]:
        item = self.items[idx]
        path = os.path.join(self.data_root, item["wav"])
        wav, sr = load_wav(path)
        if sr != self.sample_rate:
            wav = np.asarray(resample(jnp.asarray(wav), sr, self.sample_rate))
        target = int(self.duration_s * self.sample_rate)
        if wav.shape[-1] < target:
            wav = np.pad(wav, (0, target - wav.shape[-1]))
        else:
            wav = wav[:target]

        return self._caption(item), wav.astype(np.float32)

    def _caption(self, item) -> str:
        labels = item.get("labels") or item.get("caption") or ""
        if isinstance(labels, (list, tuple)):
            labels = ", ".join(str(x) for x in labels)
        return self.rng.choice(AUDIOSET_TEMPLATES_SMALL).format(labels)

    def get_batch(self, idxs: Sequence[int]) -> list:
        """Batched __getitem__: decodes all wavs in one native thread-pool
        call (audio/io.py::load_wav_batch), then resamples/pads per clip.
        Decode is capped at duration_s x 48 kHz frames — identical results
        for files at <= 48 kHz (enough pre-resample material either way)."""

        items = [self.items[i] for i in idxs]
        paths = [os.path.join(self.data_root, it["wav"]) for it in items]
        cap = int(self.duration_s * 48_000)
        wavs, frames, srs = load_wav_batch(paths, cap)
        target = int(self.duration_s * self.sample_rate)
        out = []
        for i, item in enumerate(items):
            wav, sr = wavs[i, : frames[i]], int(srs[i])
            if sr != self.sample_rate and sr > 0:
                wav = np.asarray(resample(jnp.asarray(wav), sr, self.sample_rate))
            if wav.shape[-1] < target:
                wav = np.pad(wav, (0, target - wav.shape[-1]))
            else:
                wav = wav[:target]
            out.append((self._caption(item), wav.astype(np.float32)))
        return out


class DeviceCollate:
    """Builds train batches on-device with CFG dropout + random pooling.

    Mirrors the reference CollateFunction (train_apadapter_v2.py:426-480):
      * per-batch pooling rate tp=fp sampled from {1,2,4,8},
      * per-sample dropout: 5% text-> "", 5% audio fbank -> zeros, 5% both,
      * frozen encode_prompt (no CFG) + AudioMAE, concat [GPT-2 ‖ LOA].
    One jitted function per pooling rate (4 executables).
    """

    def __init__(
        self,
        modules: PipelineModules,
        params: Dict[str, Any],
        tokenizers: Optional[HFTokenizers] = None,
        duration_s: float = 10.0,
        seed: int = 0,
        pool_choices: Tuple[int, ...] = POOL_CHOICES,
    ):
        self.modules = modules
        self.params = params
        self.tokenizers = tokenizers
        self.config = modules.config
        self.target_frames = int(duration_s * self.config.mel.frames_per_second)
        self.rng = random.Random(seed)
        self.pool_choices = pool_choices
        self._jitted: Dict[int, Any] = {}

    def _device_fn(self, pool: int):
        modules, cfg = self.modules, self.config

        def fn(params, waveforms, text: TextBatch, audio_drop):
            # VAE mel (NHWC) — reference wav_to_mel (train:308-336)
            mel = wav_to_vae_mel(waveforms, self.target_frames, cfg.mel)[..., None]

            # AudioMAE fbank with per-sample zeroing for CFG dropout
            fbank = audiomae_fbank(waveforms, cfg.fbank)
            fbank = jnp.where(audio_drop[:, None, None], jnp.zeros_like(fbank), fbank)

            t5_hidden, t5_mask, gpt2_tokens = modules.encode_prompt(params, text)
            loa = modules.encode_audio(params, fbank, pool, pool, with_uncond=False)
            ehs0 = jnp.concatenate([gpt2_tokens, loa.astype(gpt2_tokens.dtype)], axis=1)
            return {
                "mel": mel,
                "prompt_embeds": t5_hidden,
                "attention_mask": t5_mask,
                "generated_prompt_embeds": ehs0,
            }

        return jax.jit(fn)

    def __call__(self, examples: Sequence[Tuple[str, np.ndarray]]):
        texts = [t for t, _ in examples]
        waves = np.stack([w for _, w in examples])

        pool = self.rng.choice(self.pool_choices)
        audio_drop = np.zeros(len(examples), dtype=bool)
        for i in range(len(texts)):
            r = self.rng.random()
            if r < 0.05:
                texts[i] = ""
            elif r < 0.10:
                audio_drop[i] = True
            elif r < 0.15:
                texts[i] = ""
                audio_drop[i] = True

        text = make_text_batch(self.config, texts, self.tokenizers)
        if pool not in self._jitted:
            self._jitted[pool] = self._device_fn(pool)
        return self._jitted[pool](
            self.params, jnp.asarray(waves), text, jnp.asarray(audio_drop)
        )


def data_loader(dataset: AudioSetDataset, batch_size: int, collate: DeviceCollate,
                shuffle: bool = True, seed: int = 0):
    """Epoch-looping host loader (no torch DataLoader dependency): native
    thread-pool decode per batch (AudioSetDataset.get_batch); wrap with
    :func:`prefetch` to overlap host work with device steps."""

    order_rng = random.Random(seed)
    while True:
        idxs = list(range(len(dataset)))
        if shuffle:
            order_rng.shuffle(idxs)
        for i in range(0, len(idxs) - batch_size + 1, batch_size):
            yield collate(dataset.get_batch(idxs[i : i + batch_size]))


def prefetch(batches, depth: int = 2):
    """Runs the loader (decode + resample + device collate) in a background
    thread with a bounded queue, overlapping host data work with the device
    train step — the role the reference's ``--dataloader_num_workers``
    processes play (train_apadapter_v2.py:253-256). The host stages release
    the GIL (C++ decode pool, numpy, jitted collate), so one thread gives
    true overlap; ``depth`` bounds device-memory-holding batches in flight."""

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()

    def run():
        try:
            for b in batches:
                q.put(b)
            q.put(done)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    threading.Thread(target=run, daemon=True, name="ap-data-prefetch").start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
