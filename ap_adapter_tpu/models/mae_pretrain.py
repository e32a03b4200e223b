"""MAE pretraining stack: random masking, decoder, reconstruction loss.

TPU-native counterpart of the reference's pretraining-only paths in
``audio_encoder/models_mae.py`` — decoder construction (:236-301), 1-D and
2-D random masking (:427-520), masked ``forward_encoder`` (:522-546),
``forward_decoder``/``forward_loss``/``forward`` (:597-671) — plus the
finetuning classifier ``audio_encoder/models_vit.py`` (:19-187). No reference
*inference* entry point touches any of this (the conditioner only runs the
unmasked encoder), but a user pretraining or finetuning AudioMAE on new audio
domains needs it, so it is implemented rather than documented away.

Design notes (TPU-first, not a translation):
  * Masking is a pure function of an explicit PRNG key and returns integer
    index plans (``ids_keep``/``ids_restore``) with **static** kept-token
    counts, so the whole pretrain step jits to one executable — no
    data-dependent shapes. The torch version shuffles the token tensor
    in-place per call; here the gather plan is data and the modules stay
    deterministic.
  * The 2-D masking reproduces the reference's argsort-of-offset-ids trick
    (models_mae.py:509-517) with the same keep-ordering semantics, so a
    converted checkpoint trains identically given the same mask plan.
  * Only ``decoder_mode=0`` (plain ViT decoder blocks) is implemented — the
    ``mae_vit_base_patch16`` factory the reference instantiates
    (models_mae.py:689-701, AudioMAE.py:24) defaults to it; the Swin decoder
    (``decoder_mode=1``) is unused by every reference entry point.

Weight layout mirrors the torch module names 1:1 via
``convert.torch_import.audiomae_pretrain_params``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import AudioMAEConfig
from ap_adapter_tpu.models.audiomae import AudioMAEEncoder, ViTBlock
from ap_adapter_tpu.models.layers import audiomae_pos_embed

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Masking plans (pure functions; reference models_mae.py:427-520)
# ---------------------------------------------------------------------------


def random_masking(
    rng: jax.Array, batch: int, num_tokens: int, mask_ratio: float
) -> Tuple[Array, Array, Array]:
    """1-D random masking plan (reference ``random_masking``, :427-456).

    Returns ``(ids_keep [B, len_keep], mask [B, L], ids_restore [B, L])``
    where ``mask`` is 1.0 at *removed* positions. ``len_keep`` is static
    given a static ``mask_ratio``.
    """

    len_keep = int(num_tokens * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (batch, num_tokens))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = (ids_restore >= len_keep).astype(jnp.float32)
    return ids_keep, mask, ids_restore


def random_masking_2d(
    rng: jax.Array,
    batch: int,
    grid: Tuple[int, int],
    mask_t_prob: float,
    mask_f_prob: float,
) -> Tuple[Array, Array, Array]:
    """2-D (time x freq) masking plan (reference ``random_masking_2d``,
    :458-520): mask whole time rows with prob ``mask_t_prob`` and whole freq
    columns with prob ``mask_f_prob``; a token survives only if both its row
    and column survive. Kept tokens are ordered by original index (the
    reference's argsort-of-``id2res`` trick, :509-517).
    """

    t, f = grid
    len_keep_t = int(t * (1 - mask_t_prob))
    len_keep_f = int(f * (1 - mask_f_prob))
    rt, rf = jax.random.split(rng)

    ids_restore_t = jnp.argsort(jnp.argsort(jax.random.uniform(rt, (batch, t)), axis=1), axis=1)
    ids_restore_f = jnp.argsort(jnp.argsort(jax.random.uniform(rf, (batch, f)), axis=1), axis=1)
    mask_t = (ids_restore_t >= len_keep_t)[:, :, None]  # [B, T, 1]
    mask_f = (ids_restore_f >= len_keep_f)[:, None, :]  # [B, 1, F]
    mask = jnp.logical_or(mask_t, mask_f).reshape(batch, t * f)

    # kept tokens first (ascending original index), masked tokens after —
    # any offset > T*F keeps the two groups disjoint under one argsort.
    key = jnp.arange(t * f)[None, :] + (2 * t * f) * mask.astype(jnp.int32)
    ids_shuffle = jnp.argsort(key, axis=1)
    ids_keep = ids_shuffle[:, : len_keep_t * len_keep_f]
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    return ids_keep, mask.astype(jnp.float32), ids_restore


# ---------------------------------------------------------------------------
# Patch <-> pixel maps (reference patchify/unpatchify, :379-426)
# ---------------------------------------------------------------------------


def patchify(fbank: Array, patch: int) -> Array:
    """[B, T, F] log-mel -> [B, (T/p)*(F/p), p*p] patches, row-major over
    (time, freq) to match the encoder's token order and the reference's
    ``nchpwq->nhwpqc`` einsum (:402-405)."""

    b, tt, ff = fbank.shape
    h, w = tt // patch, ff // patch
    x = fbank.reshape(b, h, patch, w, patch)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h * w, patch * patch)


def unpatchify(patches: Array, grid: Tuple[int, int], patch: int) -> Array:
    """Inverse of :func:`patchify` (reference ``unpatchify``, :414-426)."""

    b = patches.shape[0]
    h, w = grid
    x = patches.reshape(b, h, w, patch, patch)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h * patch, w * patch)


# ---------------------------------------------------------------------------
# Decoder + full pretrain module
# ---------------------------------------------------------------------------


class MAEDecoder(nn.Module):
    """Plain-ViT MAE decoder (reference ``forward_decoder``, :597-642,
    ``decoder_mode=0``): embed kept tokens to ``decoder_embed_dim``, splice
    the shared mask token into the removed slots, unshuffle, add a fixed
    sin-cos pos table, run the decoder blocks, predict p*p pixels per token.
    """

    config: AudioMAEConfig = AudioMAEConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array, ids_restore: Array) -> Array:
        c = self.config
        dd = c.decoder_embed_dim
        x = nn.Dense(dd, dtype=self.dtype, name="decoder_embed")(tokens)
        b, n_in, _ = x.shape
        n_all = ids_restore.shape[1]

        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, dd), jnp.float32
        )
        filler = jnp.broadcast_to(
            mask_token.astype(self.dtype), (b, n_all + 1 - n_in, dd)
        )
        x_ = jnp.concatenate([x[:, 1:, :], filler], axis=1)  # drop CLS
        x_ = jnp.take_along_axis(x_, ids_restore[..., None], axis=1)  # unshuffle
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)  # CLS back on

        t, f = c.grid_size
        pos = jnp.asarray(audiomae_pos_embed(dd, (f, t), cls_token=True))
        x = x + pos[None].astype(self.dtype)

        for i in range(c.decoder_depth):
            x = ViTBlock(
                c.decoder_num_heads,
                c.mlp_ratio,
                c.layer_norm_eps,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="decoder_norm")(x)
        pred = nn.Dense(c.patch_size ** 2, dtype=self.dtype, name="decoder_pred")(x)
        return pred[:, 1:, :]  # drop CLS prediction


class MAEPretrain(nn.Module):
    """Full masked-autoencoder: masked encode -> decode (reference
    ``forward``, :662-671, minus the always-zero contrastive term).

    The encoder submodule is named ``audiomae`` so the condition model's
    converted params (``convert.torch_import.audiomae_condition_params``)
    drop straight in; the decoder params come from
    ``audiomae_pretrain_params`` or fresh init.
    """

    config: AudioMAEConfig = AudioMAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = AudioMAEEncoder(self.config, dtype=self.dtype, name="audiomae")
        self.decoder = MAEDecoder(self.config, dtype=self.dtype, name="decoder")

    def __call__(self, fbank: Array, ids_keep: Array, ids_restore: Array) -> Array:
        """fbank [B, T, F] + mask plan -> per-patch pixel predictions
        [B, (T/p)*(F/p), p*p]."""

        latent = self.encoder.masked(fbank, ids_keep)
        return self.decoder(latent, ids_restore)


def reconstruction_loss(
    fbank: Array, pred: Array, mask: Array, patch: int, norm_pix_loss: bool = False
) -> Array:
    """Masked MSE over removed patches (reference ``forward_loss``, :644-660),
    accumulated in fp32 regardless of compute dtype."""

    target = patchify(fbank.astype(jnp.float32), patch)
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1.0e-6)
    loss = ((pred.astype(jnp.float32) - target) ** 2).mean(axis=-1)  # [B, L]
    return (loss * mask).sum() / mask.sum()


def mae_pretrain_loss(
    model: MAEPretrain,
    params,
    fbank: Array,
    rng: jax.Array,
    *,
    mask_2d: bool = False,
    norm_pix_loss: bool = False,
) -> Array:
    """One jittable pretrain loss evaluation: draw a mask plan, run
    encode/decode, score. Matches the reference defaults (mask_ratio=0.8 1-D,
    or mask_t_prob=0.6 / mask_f_prob=0.5 2-D; models_mae.py:182-183,662)."""

    c = model.config
    t, f = c.grid_size
    batch = fbank.shape[0]
    if mask_2d:
        ids_keep, mask, ids_restore = random_masking_2d(
            rng, batch, (t, f), c.mask_t_prob, c.mask_f_prob
        )
    else:
        ids_keep, mask, ids_restore = random_masking(rng, batch, t * f, c.mask_ratio)
    pred = model.apply(params, fbank, ids_keep, ids_restore)
    return reconstruction_loss(fbank, pred, mask, c.patch_size, norm_pix_loss)


def make_mae_pretrain_step(
    model: MAEPretrain,
    tx,
    *,
    mesh=None,
    mask_2d: bool = False,
    norm_pix_loss: bool = False,
):
    """Jitted (optionally data-parallel) MAE pretrain step.

    Returns ``step(params, opt_state, fbank, rng) -> (params, opt_state,
    loss)``. With ``mesh`` the fbank batch is expected sharded over the
    ``data`` axis and params replicated — gradients all-reduce over ICI,
    the same DP recipe as the adapter trainer (train/trainer.py).
    """

    import optax

    def loss_fn(params, fbank, rng):
        return mae_pretrain_loss(model, params, fbank, rng,
                                 mask_2d=mask_2d, norm_pix_loss=norm_pix_loss)

    def step(params, opt_state, fbank, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, fbank, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


# ---------------------------------------------------------------------------
# Finetuning classifier (reference audio_encoder/models_vit.py)
# ---------------------------------------------------------------------------


class ViTClassifier(nn.Module):
    """AudioMAE finetuning classifier (reference models_vit.py:19-187).

    ``global_pool=True`` (the reference's audio configuration): mean over
    patch tokens (CLS excluded) -> ``fc_norm`` -> linear head
    (models_vit.py:50-52). ``global_pool=False``: final ``norm`` -> CLS token
    (:53-55). Pass a 2-D masking plan's ``ids_keep`` for the SpecAug-style
    masked finetune path (``forward_features_mask``, :151-177).

    Block/patch-embed param names match :class:`AudioMAEEncoder`, so an MAE
    checkpoint's encoder weights initialize this model directly.
    """

    config: AudioMAEConfig = AudioMAEConfig()
    num_classes: int = 527  # AudioSet
    global_pool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fbank: Array, ids_keep: Optional[Array] = None) -> Array:
        c = self.config
        x = fbank[..., None].astype(self.dtype)
        x = nn.Conv(
            c.embed_dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, -1, c.embed_dim)

        t, f = c.grid_size
        pos = jnp.asarray(audiomae_pos_embed(c.embed_dim, (f, t), cls_token=True))
        x = x + pos[None, 1:, :].astype(self.dtype)
        if ids_keep is not None:
            x = jnp.take_along_axis(x, ids_keep[..., None], axis=1)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, c.embed_dim), jnp.float32
        )
        cls = (cls_token + pos[None, :1, :]).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.embed_dim)), x], axis=1)

        for i in range(c.depth):
            x = ViTBlock(
                c.num_heads, c.mlp_ratio, c.layer_norm_eps, dtype=self.dtype, name=f"block_{i}"
            )(x)

        if self.global_pool:
            pooled = x[:, 1:, :].mean(axis=1)
            pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="fc_norm")(pooled)
        else:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm")(x)
            pooled = x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(pooled)
