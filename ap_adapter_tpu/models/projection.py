"""AudioLDM2 projection model: CLAP/T5 -> GPT-2 space with SOS/EOS tokens.

Mirrors ``AudioLDM2ProjectionModel`` (reference modeling_audioldm2.py:82-145):
one linear per text stream plus learned SOS/EOS embeddings inserted at the
sequence boundaries; streams are concatenated [CLAP | T5].
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ap_adapter_tpu.configs import ProjectionConfig


def _add_special_tokens(hidden, mask, sos, eos):
    b = hidden.shape[0]
    sos = jnp.broadcast_to(sos[None, None, :], (b, 1, sos.shape[-1])).astype(hidden.dtype)
    eos = jnp.broadcast_to(eos[None, None, :], (b, 1, eos.shape[-1])).astype(hidden.dtype)
    hidden = jnp.concatenate([sos, hidden, eos], axis=1)
    if mask is not None:
        ones = jnp.ones((b, 1), dtype=mask.dtype)
        mask = jnp.concatenate([ones, mask, ones], axis=-1)
    return hidden, mask


class ProjectionModel(nn.Module):
    config: ProjectionConfig = ProjectionConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        clap_features: jnp.ndarray,  # [B, S0, text_encoder_dim]
        t5_features: jnp.ndarray,  # [B, S1, text_encoder_1_dim]
        clap_mask: Optional[jnp.ndarray] = None,
        t5_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        c = self.config
        d = c.language_model_dim

        h0 = nn.Dense(d, dtype=self.dtype, name="projection")(clap_features)
        sos0 = self.param("sos_embed", nn.initializers.ones, (d,), jnp.float32)
        eos0 = self.param("eos_embed", nn.initializers.ones, (d,), jnp.float32)
        h0, m0 = _add_special_tokens(h0, clap_mask, sos0, eos0)

        h1 = nn.Dense(d, dtype=self.dtype, name="projection_1")(t5_features)
        sos1 = self.param("sos_embed_1", nn.initializers.ones, (d,), jnp.float32)
        eos1 = self.param("eos_embed_1", nn.initializers.ones, (d,), jnp.float32)
        h1, m1 = _add_special_tokens(h1, t5_mask, sos1, eos1)

        hidden = jnp.concatenate([h0, h1], axis=1)
        if m0 is not None and m1 is not None:
            mask = jnp.concatenate([m0, m1], axis=-1)
        else:
            mask = None
        return hidden, mask
