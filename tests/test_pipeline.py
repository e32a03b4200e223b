"""End-to-end pipeline tests on the tiny config (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ap_adapter_tpu.configs import tiny_pipeline_config
from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline, TextBatch


@pytest.fixture(scope="module")
def pipe():
    return AudioLDM2Pipeline.from_random(tiny_pipeline_config(), seed=0)


def _text(rng, cfg, b=1):
    clap = rng.integers(2, cfg.clap.vocab_size, (b, 6))
    t5 = rng.integers(2, cfg.t5.vocab_size, (b, 5))
    return TextBatch(
        clap_ids=jnp.asarray(clap, jnp.int32),
        clap_mask=jnp.ones((b, 6), jnp.int32),
        t5_ids=jnp.asarray(t5, jnp.int32),
        t5_mask=jnp.ones((b, 5), jnp.int32),
    )


def test_generate_end_to_end(pipe, rng):
    cfg = pipe.config
    pos = _text(rng, cfg)
    neg = _text(rng, cfg)
    fbank = jnp.asarray(rng.standard_normal((1, *cfg.audiomae.img_size)).astype(np.float32))

    wav = pipe.generate(
        pos, neg, fbank,
        audio_length_in_s=0.2,  # tiny: 0.2s * 16k / (16 upsample * 4 scale) -> small latent
        num_inference_steps=4,
        guidance_scale=3.0,
        ap_scale=0.5,
        time_pool=2,
        freq_pool=2,
        seed=0,
    )
    assert wav.shape[0] == 1
    assert wav.shape[1] == int(0.2 * cfg.vocoder.sampling_rate)
    assert np.all(np.isfinite(wav))
    assert np.abs(wav).max() <= 1.0  # tanh output


def test_generate_deterministic_and_seed_sensitive(pipe, rng):
    cfg = pipe.config
    pos, neg = _text(rng, cfg), _text(rng, cfg)
    fbank = jnp.asarray(rng.standard_normal((1, *cfg.audiomae.img_size)).astype(np.float32))
    kw = dict(audio_length_in_s=0.2, num_inference_steps=2, guidance_scale=3.0,
              ap_scale=0.5, time_pool=2, freq_pool=2)
    a = pipe.generate(pos, neg, fbank, seed=0, **kw)
    b = pipe.generate(pos, neg, fbank, seed=0, **kw)
    c = pipe.generate(pos, neg, fbank, seed=1, **kw)
    np.testing.assert_allclose(a, b)
    assert not np.allclose(a, c)


def test_generate_text_only(pipe, rng):
    cfg = pipe.config
    pos, neg = _text(rng, cfg), _text(rng, cfg)
    wav = pipe.generate(
        pos, neg, None,
        audio_length_in_s=0.2, num_inference_steps=2, guidance_scale=3.0,
    )
    assert wav.shape == (1, int(0.2 * cfg.vocoder.sampling_rate))
    assert np.all(np.isfinite(wav))


def test_ap_scale_changes_output(pipe, rng):
    cfg = pipe.config
    pos, neg = _text(rng, cfg), _text(rng, cfg)
    fbank = jnp.asarray(rng.standard_normal((1, *cfg.audiomae.img_size)).astype(np.float32))
    kw = dict(audio_length_in_s=0.2, num_inference_steps=2, guidance_scale=3.0,
              time_pool=2, freq_pool=2, seed=0)
    a = pipe.generate(pos, neg, fbank, ap_scale=0.0, **kw)
    b = pipe.generate(pos, neg, fbank, ap_scale=0.9, **kw)
    assert not np.allclose(a, b)


def test_sharded_generate_matches_single_device(pipe, rng):
    """Data-parallel serving (SURVEY §2.5): generate over an 8-device mesh
    must equal single-device generate on identical seeds — the mesh shards
    the batch only, per-sample math is untouched."""

    import jax
    from ap_adapter_tpu.parallel import mesh as mesh_lib

    assert jax.device_count() == 8
    cfg = pipe.config
    b = 8
    pos, neg = _text(rng, cfg, b=b), _text(rng, cfg, b=b)
    fbank = jnp.asarray(
        rng.standard_normal((b, *cfg.audiomae.img_size)).astype(np.float32))
    kw = dict(audio_length_in_s=0.2, num_inference_steps=2, guidance_scale=3.0,
              ap_scale=0.5, time_pool=2, freq_pool=2, seed=0)

    ref = pipe.generate(pos, neg, fbank, **kw)

    mesh = mesh_lib.create_mesh()
    sharded_pipe = AudioLDM2Pipeline(pipe.config, pipe.params, mesh=mesh)
    out = sharded_pipe.generate(pos, neg, fbank, **kw)

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_latent_time_math():
    pipe_cfg = tiny_pipeline_config()
    p = AudioLDM2Pipeline(pipe_cfg, params={})
    # tiny vocoder upsamples 16x at 16 kHz -> 1 ms per frame; 0.2 s -> 200
    # frames -> /4 latent = 50
    assert p.latent_time_for_seconds(0.2) == 50


def test_hoist_name_contract_fires(pipe):
    """A renamed UNet module must trip the structural check at build time
    (models/hoist.validate_site_names), not a KeyError inside a jit trace."""

    import jax

    from ap_adapter_tpu.models.hoist import validate_site_names

    cfg = pipe.config
    good = jax.tree_util.tree_map(lambda x: x, pipe.params)  # shallow-ish copy
    validate_site_names(good["unet"], cfg.unet)  # sane tree passes

    broken = dict(good["unet"])
    broken["mid_resnet_0_RENAMED"] = broken.pop("mid_resnet_0")
    with pytest.raises(ValueError, match="mid_resnet_0"):
        validate_site_names(broken, cfg.unet)

    # and the pipeline constructor runs the check when hoisting is on
    bad_params = dict(good)
    bad_params["unet"] = broken
    assert cfg.hoist_step_invariants
    with pytest.raises(ValueError, match="out of sync"):
        AudioLDM2Pipeline(cfg, bad_params)


def test_merge_trees_prefers_existing():
    from ap_adapter_tpu.pipeline.pipeline import _merge_trees

    old = {"a": {"x": 1}, "b": 2}
    new = {"a": {"x": 99, "y": 3}, "c": 4}
    out = _merge_trees(old, new)
    assert out == {"a": {"x": 1, "y": 3}, "b": 2, "c": 4}
    # inputs not mutated
    assert old == {"a": {"x": 1}, "b": 2}


def test_ensure_unet_quant_extends_per_geometry(pipe):
    """New latent geometries extend (never replace) the quant collection and
    are only built once each."""

    import dataclasses

    cfg = pipe.config.replace(
        unet=dataclasses.replace(pipe.config.unet, use_weight_prep=True))
    p = AudioLDM2Pipeline(cfg, pipe.params)
    built0 = set(p._quant_built)
    assert built0  # the 10 s default geometry was built at construction

    lt = p.latent_time_for_seconds(0.2)
    p._ensure_unet_quant(lt)
    assert lt in p._quant_built
    p._ensure_unet_quant(lt)  # idempotent
    assert len(p._quant_built) == len(built0 | {lt})
