"""Fused avg+max token pooling for AudioMAE embeddings.

The reference pools the 512 AudioMAE tokens on a (64 time, 8 freq) grid with
``(AvgPool2d + MaxPool2d) / 2`` where kernel == stride == (tp, fp)
(audio_encoder/AudioMAE.py:148-182). Because kernel == stride, the pool is a
plain reshape + reduction — no windowed gather needed; XLA fuses the mean and
max into one pass over the data.
"""

from __future__ import annotations

import jax.numpy as jnp


def avg_max_pool_tokens(
    tokens: jnp.ndarray,
    grid: tuple[int, int],
    time_pool: int,
    freq_pool: int,
) -> jnp.ndarray:
    """tokens [B, T*F, D] on a (T, F) row-major grid -> [B, (T/tp)*(F/fp), D].

    Output = (mean + max) / 2 over each (tp, fp) cell, matching the reference's
    AvgPool2d/MaxPool2d combination exactly.
    """

    t, f = grid
    b, n, d = tokens.shape
    assert n == t * f, f"token count {n} != grid {t}x{f}"
    assert t % time_pool == 0 and f % freq_pool == 0, (grid, time_pool, freq_pool)

    x = tokens.reshape(b, t // time_pool, time_pool, f // freq_pool, freq_pool, d)
    avg = jnp.mean(x, axis=(2, 4))
    mx = jnp.max(x, axis=(2, 4))
    pooled = (avg + mx) * 0.5
    return pooled.reshape(b, (t // time_pool) * (f // freq_pool), d)
