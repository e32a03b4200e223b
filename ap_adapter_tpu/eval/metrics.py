"""Evaluation metrics: Fréchet Audio Distance + embedding similarity.

The reference ships eval clips (eval_audio_in_domain/, eval_audio_out_of_domain/)
and lists ``frechet-audio-distance`` in requirements (SURVEY §4); the FAD
statistics math is implemented here generically over any embedding function.
The default embedder is the (frozen) AudioMAE encoder's pooled tokens — a
self-contained on-TPU stand-in for VGGish; plug a VGGish/CLAP embedder in via
``embed_fn`` when those weights are available.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """FAD = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) (numpy, fp64)."""

    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(covmean))


def embedding_stats(embeddings: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N, D] -> (mu [D], sigma [D, D]) in float64."""

    e = np.asarray(embeddings, dtype=np.float64)
    mu = e.mean(axis=0)
    sigma = np.cov(e, rowvar=False)
    return mu, sigma


def fad(
    reference_embeddings: np.ndarray, generated_embeddings: np.ndarray
) -> float:
    mu1, s1 = embedding_stats(reference_embeddings)
    mu2, s2 = embedding_stats(generated_embeddings)
    return frechet_distance(mu1, s1, mu2, s2)


def audiomae_clip_embedding(pipe, waveform: np.ndarray, sample_rate: int) -> np.ndarray:
    """Fallback FAD embedder: mean-pooled AudioMAE tokens of a clip [D].

    Self-contained (reuses the pipeline's own frozen encoder) but NOT
    externally comparable; prefer ``clap_audio_embeddings`` (standard,
    checkpoint-anchored embedding space) when CLAP audio-tower params exist.
    """

    fbank = pipe.prepare_fbank(waveform, sample_rate)
    t, f = pipe.config.audiomae.grid_size
    tp, fp = min(8, t), min(8, f)  # eval pooling (8x8 at full scale)
    tokens = pipe.modules.encode_audio(pipe.params, fbank, tp, fp, with_uncond=False)
    return np.asarray(jnp.mean(tokens[0], axis=0))


def clap_audio_embeddings(scorer, waveforms, sample_rate: int) -> np.ndarray:
    """Standard FAD embedding space: the parity-tested CLAP audio tower
    (models/clap_audio.py) — the checkpoint-anchored counterpart of the
    reference's VGGish-based ``frechet-audio-distance`` tooling
    (reference requirements.txt). ``waveforms`` is a list of 1-D arrays
    (variable lengths OK) or one [B, N] array. Returns [B, proj_dim]."""

    if isinstance(waveforms, np.ndarray) and waveforms.ndim == 2:
        return scorer.audio_features(waveforms, sample_rate)
    return np.concatenate(
        [scorer.audio_features(np.asarray(w), sample_rate) for w in waveforms], axis=0
    )


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def score_waveforms(
    pipe,
    text_embedding: np.ndarray,
    waveforms: Sequence[np.ndarray],
    sample_rate: int,
    embed_fn: Callable = audiomae_clip_embedding,
) -> np.ndarray:
    """Rank candidate waveforms by similarity to a target embedding —
    the re-ranking hook mirroring reference ``score_waveforms``
    (pipeline_audioldm2.py:592-614, CLAP text-audio similarity). Returns
    indices sorted best-first."""

    sims = [cosine_similarity(text_embedding, embed_fn(pipe, w, sample_rate)) for w in waveforms]
    return np.argsort(sims)[::-1]
