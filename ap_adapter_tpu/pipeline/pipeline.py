"""AudioLDM2 + audio-prompt-adapter inference pipeline, fully jitted.

TPU-native re-design of the reference ``AudioLDM2Pipeline``
(pipeline/pipeline_audioldm2.py:746-1062): text conditioning
(CLAP + T5 -> projection -> GPT-2), AudioMAE audio conditioning with
time/freq pooling, classifier-free guidance, a 50-step DDIM ``lax.scan``,
VAE decode and HiFi-GAN vocoding — compiled as ONE XLA executable per
(batch, shapes, steps) bucket. Text tokenization stays on the host; token ids
are the pipeline inputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ap_adapter_tpu.configs import PipelineConfig
from ap_adapter_tpu.audio.fbank import audiomae_fbank
from ap_adapter_tpu.diffusion.sampling import ddim_sample_loop
from ap_adapter_tpu.models.audiomae import AudioMAECondition
from ap_adapter_tpu.models.clap import ClapTextEncoder
from ap_adapter_tpu.models.gpt2 import GPT2Model, generate_hidden_states
from ap_adapter_tpu.models.projection import ProjectionModel
from ap_adapter_tpu.models.t5 import T5Encoder
from ap_adapter_tpu.models.unet import AudioLDM2UNet
from ap_adapter_tpu.models.vae import AutoencoderKL
from ap_adapter_tpu.models.vocoder import HiFiGAN


def _host_cpu_device():
    """The host CPU device for serving-side DSP prep (fbank/resample).

    Falls back to the default device if no CPU backend is initialized
    (never the case in practice — JAX always registers cpu)."""

    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def cast_params_to(params, dtype):
    """Cast floating-point param leaves to the compute dtype.

    For inference, weights stored in bf16 halve HBM traffic AND avoid
    re-casting 740M fp32 params on every step of the denoise scan (XLA does
    not hoist loop-invariant casts out of while loops). Training keeps fp32
    masters; this is an inference-serving optimization.
    """

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, params)


def _merge_trees(old, new):
    """Deep-merge two nested variable dicts; entries present in both keep
    the ``old`` leaf (they are built from the same weights either way)."""

    if not isinstance(old, dict) or not isinstance(new, dict):
        return old
    out = dict(new)
    for k, v in old.items():
        out[k] = _merge_trees(v, new[k]) if k in new else v
    return out


def unet_variables(params: Dict[str, Any]) -> Dict[str, Any]:
    """UNet apply-variables: params plus, in int8 serving mode, the "quant"
    collection of pre-quantized weights (built once by
    AudioLDM2Pipeline._build_unet_quant — key "unet_quant")."""

    v = {"params": params["unet"]}
    if "unet_quant" in params:
        v["quant"] = params["unet_quant"]
    return v


@flax.struct.dataclass
class TextBatch:
    """Tokenized prompts (host-side tokenization, padded to fixed lengths)."""

    clap_ids: jnp.ndarray  # [B, Sc]
    clap_mask: jnp.ndarray  # [B, Sc]
    t5_ids: jnp.ndarray  # [B, St]
    t5_mask: jnp.ndarray  # [B, St]


class PipelineModules:
    """All Flax module objects for one PipelineConfig (no parameters)."""

    def __init__(self, config: PipelineConfig):
        self.config = config
        dt = config.dtype
        self.clap = ClapTextEncoder(config.clap, dtype=dt)
        self.t5 = T5Encoder(config.t5, dtype=dt)
        self.gpt2 = GPT2Model(config.gpt2, dtype=dt)
        self.projection = ProjectionModel(config.projection, dtype=dt)
        self.audiomae = AudioMAECondition(config.audiomae, dtype=dt)
        self.unet = AudioLDM2UNet(config.unet, dtype=dt)
        self.vae = AutoencoderKL(config.vae, dtype=dt)
        self.vocoder = HiFiGAN(config.vocoder, dtype=dt)

    def init_params(self, seed: int = 0, fast: bool = True) -> Dict[str, Any]:
        """Random params for every submodel (benchmarks / tests; real use
        loads converted checkpoints via convert/torch_import.py).

        ``fast`` fills leaves host-side via eval_shape (utils.init.fast_init)
        — at full scale, compiling the real init graph takes minutes on TPU.
        """

        from ap_adapter_tpu.utils.init import fast_init

        c = self.config
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 8)
        t, f = c.audiomae.grid_size

        def init_of(module, *args):
            return lambda rng: module.init(rng, *args)

        specs = {
            "clap": init_of(self.clap, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)),
            "t5": init_of(self.t5, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)),
            "gpt2": init_of(self.gpt2, jnp.zeros((1, 4, c.gpt2.n_embd))),
            "projection": init_of(
                self.projection,
                jnp.zeros((1, 1, c.projection.text_encoder_dim)),
                jnp.zeros((1, 4, c.projection.text_encoder_1_dim)),
                jnp.ones((1, 1), jnp.int32),
                jnp.ones((1, 4), jnp.int32),
            ),
            "audiomae": init_of(self.audiomae, jnp.zeros((1, *c.audiomae.img_size)), t, f),
            "unet": init_of(
                self.unet,
                jnp.zeros((1, 8, 8, c.unet.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, c.unet.adapter_num_tokens + 4, c.unet.adapter_cross_attention_dim)),
                jnp.zeros((1, 4, [d for d in c.unet.cross_attention_dims if d][-1])),
                None,
                0.0,
            ),
            "vae": init_of(
                self.vae,
                jnp.zeros((1, 4 * c.vae.scale_factor, 4 * c.vae.scale_factor, c.vae.in_channels)),
                jax.random.PRNGKey(0),
            ),
            "vocoder": init_of(self.vocoder, jnp.zeros((1, 8, c.vocoder.model_in_dim))),
        }
        params = {}
        for i, (name, fn) in enumerate(specs.items()):
            if fast:
                params[name] = fast_init(lambda rng: fn(rng), seed=seed + i)["params"]
            else:
                params[name] = fn(ks[i])["params"]
        return params

    # ------------------------------------------------------------------
    # conditioning
    # ------------------------------------------------------------------

    def encode_prompt(
        self, params: Dict[str, Any], text: TextBatch
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Replicates reference ``encode_prompt`` (pipeline_audioldm2.py:272-580)
        for one batch (no CFG duplication here).

        Returns (t5_hidden [B,St,1024], t5_mask [B,St], gpt2_tokens [B,8,768]).
        """

        c = self.config
        clap_feat = self.clap.apply({"params": params["clap"]}, text.clap_ids, text.clap_mask)
        clap_feat = clap_feat[:, None, :]  # 1 pooled token (reference :404-412)
        clap_mask = jnp.ones((clap_feat.shape[0], 1), dtype=jnp.int32)

        t5_hidden = self.t5.apply({"params": params["t5"]}, text.t5_ids, text.t5_mask)

        proj, proj_mask = self.projection.apply(
            {"params": params["projection"]}, clap_feat, t5_hidden, clap_mask, text.t5_mask
        )
        gpt2_tokens = generate_hidden_states(
            self.gpt2, params["gpt2"], proj, proj_mask, max_new_tokens=c.gpt2.max_new_tokens
        )
        return t5_hidden, text.t5_mask, gpt2_tokens

    def encode_audio(
        self,
        params: Dict[str, Any],
        fbank: jnp.ndarray,  # [B, 1024, 128]
        time_pool: int,
        freq_pool: int,
        with_uncond: bool = True,
    ) -> jnp.ndarray:
        """Pooled AudioMAE tokens; with_uncond prepends the zeros-fbank branch
        (reference pipeline_audioldm2.py:919-956)."""

        if with_uncond:
            fbank = jnp.concatenate([jnp.zeros_like(fbank), fbank], axis=0)
        return self.audiomae.apply(
            {"params": params["audiomae"]}, fbank, time_pool, freq_pool
        )

    # ------------------------------------------------------------------
    # generation (pure function; jitted by AudioLDM2Pipeline)
    # ------------------------------------------------------------------

    def generate_waveform(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        fbank: Optional[jnp.ndarray],
        text_pos: TextBatch,
        text_neg: TextBatch,
        *,
        num_inference_steps: int,
        guidance_scale: jnp.ndarray | float,
        ap_scale: jnp.ndarray | float,
        time_pool: int,
        freq_pool: int,
        latent_time: int,
        init_latents: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full text(+audio)->waveform generation with CFG.

        Returns waveforms [B, latent_time * vae_scale * vocoder_upsample].
        """

        c = self.config
        b = text_pos.clap_ids.shape[0]

        # batch [neg; pos] through the text stack in one pass (CFG order:
        # uncond first — reference pipeline_audioldm2.py:534-567)
        both = TextBatch(
            clap_ids=jnp.concatenate([text_neg.clap_ids, text_pos.clap_ids]),
            clap_mask=jnp.concatenate([text_neg.clap_mask, text_pos.clap_mask]),
            t5_ids=jnp.concatenate([text_neg.t5_ids, text_pos.t5_ids]),
            t5_mask=jnp.concatenate([text_neg.t5_mask, text_pos.t5_mask]),
        )
        t5_hidden, t5_mask, gpt2_tokens = self.encode_prompt(params, both)

        if fbank is not None:
            audio_tokens = self.encode_audio(params, fbank, time_pool, freq_pool, with_uncond=True)
            ehs0 = jnp.concatenate([gpt2_tokens, audio_tokens.astype(gpt2_tokens.dtype)], axis=1)
        else:
            ehs0 = gpt2_tokens

        latent_freq = c.vocoder.model_in_dim // c.vae.scale_factor
        if init_latents is None:
            latents = jax.random.normal(
                rng, (b, latent_time, latent_freq, c.unet.in_channels), dtype=jnp.float32
            )
        else:
            latents = init_latents

        # hoist every step-invariant computation out of the denoise scan
        # (models/hoist.py): cross K/V + T5 bias become scan constants, the
        # timestep-embedding rows ride the scan xs sliced per step
        ctx_kv = None
        step_aux = None
        if c.hoist_step_invariants:
            from ap_adapter_tpu.diffusion.ddim import inference_timesteps
            from ap_adapter_tpu.models.hoist import (
                precompute_cross_kv, precompute_temb_rows)

            if not c.unet.use_int8:
                # int8 serving re-projects K/V inside the kernel; building
                # ctx_kv there would waste HBM and (by suppressing bias1 in
                # the UNet) drop the T5 padding mask on the int8 cross route
                ctx_kv = precompute_cross_kv(
                    params["unet"], c.unet, ehs0, t5_hidden, t5_mask, c.dtype)
            ts_np = inference_timesteps(c.scheduler, num_inference_steps)
            step_aux = {"temb": precompute_temb_rows(
                params["unet"], c.unet, ts_np, c.dtype)}

        def unet_fn(model_in, t, aux=None):
            ts = jnp.broadcast_to(t.astype(jnp.float32), (model_in.shape[0],))
            return self.unet.apply(
                unet_variables(params),
                model_in.astype(c.dtype),
                ts,
                ehs0,
                t5_hidden,
                t5_mask,
                ip_scale=ap_scale,
                ctx_kv=ctx_kv,
                temb_rows=aux["temb"] if aux is not None else None,
            )

        latents = ddim_sample_loop(
            unet_fn,
            latents,
            c.scheduler,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            do_cfg=True,
            step_aux=step_aux,
        )

        mel = self.vae.apply(
            {"params": params["vae"]},
            (latents / c.vae.scaling_factor).astype(c.dtype),
            method=AutoencoderKL.decode,
        )  # [B, T, F, 1]
        wav = self.vocoder.apply({"params": params["vocoder"]}, mel[..., 0].astype(jnp.float32))
        return wav.astype(jnp.float32)


class AudioLDM2Pipeline:
    """User-facing pipeline: owns params, jits generate per shape bucket."""

    def __init__(self, config: PipelineConfig, params: Dict[str, Any],
                 device=None, mesh=None, tensor_parallel: bool = False):
        import dataclasses

        from ap_adapter_tpu.ops.attention import _on_tpu

        self.tensor_parallel = bool(
            tensor_parallel and mesh is not None
            and mesh.shape.get("model", 1) > 1)
        if tensor_parallel and not self.tensor_parallel:
            raise ValueError(
                "tensor_parallel=True needs a mesh with a 'model' axis of "
                f"size > 1 (got mesh={None if mesh is None else dict(mesh.shape)})")
        if self.tensor_parallel:
            # latency mode (parallel/tp.py): UNet transformer weights
            # sharded over 'model'; the Pallas kernels and their prepared
            # weight copies are DP-only, so force the GSPMD-partitionable
            # XLA core instead
            config = config.replace(unet=dataclasses.replace(
                config.unet, force_xla_core=True,
                use_weight_prep=False, use_int8=False))
        elif _on_tpu() and not config.unet.use_weight_prep:
            # serving on TPU: store head-padded weight copies once (the
            # "quant" collection) instead of re-padding every DDIM step
            config = config.replace(
                unet=dataclasses.replace(config.unet, use_weight_prep=True))
        self.config = config
        self.modules = PipelineModules(config)
        # data-parallel serving (SURVEY §2.5): params replicated over the
        # mesh, the batch axis sharded over 'data' — generate() places inputs,
        # jit + GSPMD propagate the sharding through the whole graph
        self.mesh = mesh
        # commit params to device once — host (numpy) leaves would otherwise be
        # re-transferred on every jitted call (catastrophic through a relay)
        if params:
            if self.tensor_parallel:
                from ap_adapter_tpu.parallel import tp as tp_lib

                params = tp_lib.tp_place_params(
                    mesh, params, config.unet.num_attention_heads)
            elif mesh is not None:
                from ap_adapter_tpu.parallel import mesh as mesh_lib

                params = mesh_lib.replicate_params(mesh, params)
            else:
                device = device or jax.devices()[0]
                params = jax.device_put(params, device)
        self.params = params
        self._jitted: Dict[Tuple, Any] = {}
        self._quant_built: set = set()
        if config.hoist_step_invariants and params:
            # fail at build time, not deep inside a jit trace, if the
            # hoist<->unet string name contract ever desynchronizes
            from ap_adapter_tpu.models.hoist import validate_site_names

            validate_site_names(params["unet"], config.unet)
        if (config.unet.use_int8 or config.unet.use_weight_prep) \
                and params and "unet_quant" not in params:
            # int8 / weight-prep serving mode: quantize (or head-pad) the
            # routed UNet weights ONCE here (one jitted dummy forward with
            # mutable=["quant"]); the step graph then only reads the
            # prepared copies — no per-step requant/re-pad
            self._ensure_unet_quant(self.latent_time_for_seconds(10.0))

    def _ensure_unet_quant(self, latent_time: int) -> None:
        """Extend the "quant" collection for a new latent geometry.

        The fused-kernel routing guards are shape-dependent
        (n >= _SMALL_ATTN_MIN_N, the AP_FUSE_SMALL_ATTN env): a latent_time
        larger than any geometry built so far can route a site that has no
        prepared variable yet, which would crash in self.variable() inside
        the immutable apply. Build the collection at THIS geometry too and
        deep-merge (existing entries win — same weights either way)."""

        c = self.config
        if not (c.unet.use_int8 or c.unet.use_weight_prep) or not self.params:
            return
        if latent_time in self._quant_built:
            return
        new = self._build_unet_quant(self.params, latent_time)
        if self.mesh is not None:
            from ap_adapter_tpu.parallel import mesh as mesh_lib

            new = mesh_lib.replicate_params(self.mesh, new)
        cur = self.params.get("unet_quant")
        self.params = dict(self.params)
        self.params["unet_quant"] = new if cur is None else _merge_trees(cur, new)
        self._quant_built.add(latent_time)

    def _build_unet_quant(self, params, latent_time: Optional[int] = None) -> Dict[str, Any]:
        """Run one batch-1 UNet forward at the real latent geometry with the
        "quant" collection mutable — every routed int8 site writes its
        quantized weights (models/unet_blocks.py self.variable calls). Real
        shapes matter: the kernel routing guards are shape-dependent, and a
        site that doesn't route doesn't create its variables."""

        c = self.config
        lt = latent_time if latent_time is not None \
            else self.latent_time_for_seconds(10.0)
        lf = c.vocoder.model_in_dim // c.vae.scale_factor
        sample = jnp.zeros((1, lt, lf, c.unet.in_channels), jnp.float32)
        ts = jnp.zeros((1,), jnp.float32)
        ehs0 = jnp.zeros(
            (1, c.unet.adapter_num_tokens + 8, c.unet.adapter_cross_attention_dim),
            c.dtype)
        d1 = [d for d in c.unet.cross_attention_dims if d][-1]
        ehs1 = jnp.zeros((1, 8, d1), c.dtype)
        mask1 = jnp.ones((1, 8), jnp.int32)

        @jax.jit
        def build(p):
            # mirror the serving route: with hoisting enabled, cross sites
            # take the precomputed-K/V kernel path, whose prep variables
            # ("cross_prep") only materialize when ctx_kv is supplied
            ctx_kv = None
            if c.hoist_step_invariants and not c.unet.use_int8:
                from ap_adapter_tpu.models.hoist import precompute_cross_kv

                ctx_kv = precompute_cross_kv(p, c.unet, ehs0, ehs1, mask1, c.dtype)
            _, mut = self.modules.unet.apply(
                {"params": p}, sample, ts, ehs0, ehs1, mask1, ip_scale=0.5,
                ctx_kv=ctx_kv, mutable=["quant"])
            # configs whose shapes route no fused kernel create no variables
            return mut.get("quant", {})

        import flax.core

        return flax.core.unfreeze(build(params["unet"]))

    @classmethod
    def from_random(
        cls, config: PipelineConfig, seed: int = 0, cast_params: bool = True
    ) -> "AudioLDM2Pipeline":
        modules = PipelineModules(config)
        params = modules.init_params(seed)
        if cast_params:
            params = cast_params_to(params, config.dtype)
        return cls(config, params)

    # -- host-side helpers ------------------------------------------------

    def latent_time_for_seconds(self, seconds: float) -> int:
        """Reference length math (pipeline_audioldm2.py:855-870): mel frames =
        seconds / (upsample_factor / sr), latent frames = frames / vae_scale."""

        c = self.config
        frame_s = c.vocoder.upsample_factor / c.vocoder.sampling_rate
        height = int(seconds / frame_s)
        scale = c.vae.scale_factor
        if height % scale != 0:
            height = ((height // scale) + 1) * scale
        return height // scale

    def prepare_fbank(self, waveform: np.ndarray, sample_rate: int) -> jnp.ndarray:
        """Host wav -> normalized AudioMAE fbank [1, 1024, 128].

        Runs on the host CPU backend: serving loops prep the next clip's
        fbank while the TPU denoises the previous batch, and a TPU-placed
        fbank op would queue behind that multi-second denoise (its blocking
        readback then serializes the whole pipeline — measured as the r4
        eval-sweep regression, docs/PERF.md).
        """

        from ap_adapter_tpu.audio.dsp import resample

        with jax.default_device(_host_cpu_device()):
            wav = jnp.asarray(np.atleast_2d(waveform).mean(axis=0), dtype=jnp.float32)
            if sample_rate != self.config.fbank.sample_rate:
                wav = resample(wav, sample_rate, self.config.fbank.sample_rate)
            return audiomae_fbank(wav, self.config.fbank)[None]

    def generate(
        self,
        text_pos: TextBatch,
        text_neg: TextBatch,
        fbank: Optional[jnp.ndarray] = None,
        *,
        audio_length_in_s: float = 10.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        ap_scale: float = 0.5,
        time_pool: int = 2,
        freq_pool: int = 2,
        seed: int = 0,
        materialize: bool = True,
    ) -> np.ndarray:
        """Generate waveforms [B, samples] (trimmed to audio_length_in_s).

        ``materialize=False`` returns the (untrimmed) device array without
        forcing the device->host transfer: callers issuing several calls can
        dispatch them all and materialize at the end, overlapping each call's
        host-side work (arg marshaling, small transfers, output readback)
        with the previous call's device compute — the serving pattern.
        """

        c = self.config
        latent_time = self.latent_time_for_seconds(audio_length_in_s)
        self._ensure_unet_quant(latent_time)
        key = (
            "gen", text_pos.clap_ids.shape, text_pos.t5_ids.shape,
            fbank is None, num_inference_steps, time_pool, freq_pool, latent_time,
        )
        if key not in self._jitted:
            def fn(params, rng, fbank_, tp_, tn_, g, s):
                return self.modules.generate_waveform(
                    params, rng, fbank_, tp_, tn_,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=g, ap_scale=s,
                    time_pool=time_pool, freq_pool=freq_pool,
                    latent_time=latent_time,
                )
            if fbank is None:
                def fn_nofb(params, rng, tp_, tn_, g, s):
                    return self.modules.generate_waveform(
                        params, rng, None, tp_, tn_,
                        num_inference_steps=num_inference_steps,
                        guidance_scale=g, ap_scale=s,
                        time_pool=time_pool, freq_pool=freq_pool,
                        latent_time=latent_time,
                    )
                self._jitted[key] = jax.jit(fn_nofb)
            else:
                self._jitted[key] = jax.jit(fn)

        rng = jax.random.PRNGKey(seed)
        g = jnp.asarray(guidance_scale, jnp.float32)
        s = jnp.asarray(ap_scale, jnp.float32)
        if self.mesh is not None:
            from ap_adapter_tpu.parallel import mesh as mesh_lib

            text_pos = mesh_lib.shard_batch(self.mesh, text_pos)
            text_neg = mesh_lib.shard_batch(self.mesh, text_neg)
            if fbank is not None:
                fbank = mesh_lib.shard_batch(self.mesh, jnp.asarray(fbank))
            rep = mesh_lib.replicated(self.mesh)
            rng, g, s = (jax.device_put(x, rep) for x in (rng, g, s))
        if fbank is None:
            wav = self._jitted[key](self.params, rng, text_pos, text_neg, g, s)
        else:
            wav = self._jitted[key](self.params, rng, fbank, text_pos, text_neg, g, s)

        if not materialize:
            return wav
        samples = int(audio_length_in_s * c.vocoder.sampling_rate)
        return np.asarray(wav)[:, :samples]

    def generate_ranked(
        self,
        text_pos: TextBatch,
        text_neg: TextBatch,
        fbank: Optional[jnp.ndarray] = None,
        *,
        num_waveforms_per_prompt: int = 1,
        scorer=None,
        **kwargs,
    ) -> np.ndarray:
        """Generate N candidates per prompt and (optionally) re-rank them by
        CLAP text-audio similarity, best first — the reference's
        ``num_waveforms_per_prompt`` + ``score_waveforms`` behavior
        (pipeline_audioldm2.py:592-614, 1047-1054). ``scorer`` is an
        eval.clap_scoring.ClapScorer; without one, generation order is kept.

        Returns [B * num_waveforms_per_prompt, samples], grouped per prompt.
        """

        n = num_waveforms_per_prompt
        if n > 1:
            def tile(x):
                return jnp.repeat(x, n, axis=0)

            text_pos = jax.tree_util.tree_map(tile, text_pos)
            text_neg = jax.tree_util.tree_map(tile, text_neg)
            if fbank is not None:
                fbank = jnp.repeat(jnp.asarray(fbank), n, axis=0)
        base_seed = kwargs.pop("seed", 0)
        wavs = self.generate(text_pos, text_neg, fbank, seed=base_seed, **kwargs)

        if scorer is None or n == 1:
            return wavs

        sr = self.config.vocoder.sampling_rate
        out = np.empty_like(wavs)
        b = wavs.shape[0] // n
        for i in range(b):
            group = wavs[i * n : (i + 1) * n]
            ids = np.asarray(text_pos.clap_ids[i * n : i * n + 1])
            mask = np.asarray(text_pos.clap_mask[i * n : i * n + 1])
            order = scorer.rank(ids, mask, list(group), sr)
            out[i * n : (i + 1) * n] = group[order]
        return out
