"""Tensor-parallel serving (parallel/tp.py) on the virtual 8-device CPU mesh.

The reference has no TP at all (single-GPU serving, inference.py:13); the
TPU-native latency mode shards the UNet transformer stacks over the mesh's
'model' axis via GSPMD param shardings. These tests pin the two things that
matter: the params are REALLY sharded (per-device shards shrink), and the
partitioned graph computes the same waveform as the single-device pipeline.
"""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from ap_adapter_tpu.configs import tiny_pipeline_config
from ap_adapter_tpu.parallel import mesh as mesh_lib
from ap_adapter_tpu.parallel import tp as tp_lib
from ap_adapter_tpu.pipeline.pipeline import AudioLDM2Pipeline, TextBatch


@pytest.fixture(scope="module")
def pipe():
    return AudioLDM2Pipeline.from_random(tiny_pipeline_config(), seed=0)


def _text(rng, cfg, b=1):
    return TextBatch(
        clap_ids=jnp.asarray(rng.integers(2, cfg.clap.vocab_size, (b, 6)), jnp.int32),
        clap_mask=jnp.ones((b, 6), jnp.int32),
        t5_ids=jnp.asarray(rng.integers(2, cfg.t5.vocab_size, (b, 5)), jnp.int32),
        t5_mask=jnp.ones((b, 5), jnp.int32),
    )


def test_tp_spec_rules():
    """Column/row rules on representative leaves (scan-stacked included)."""

    mesh = mesh_lib.create_mesh(data=1, model=2,
                                devices=jax.devices()[:2])
    heads = 2
    unet = {
        "g": {"attentions_1": {"transformer_blocks": {
            "attn1": {
                "to_q": {"kernel": np.zeros((2, 32, 32), np.float32)},
                "to_out": {"kernel": np.zeros((2, 32, 32), np.float32),
                           "bias": np.zeros((2, 32), np.float32)},
            },
            "ff": {
                "geglu_proj": {"kernel": np.zeros((2, 32, 256), np.float32),
                               "bias": np.zeros((2, 256), np.float32)},
                "out_proj": {"kernel": np.zeros((2, 128, 32), np.float32),
                             "bias": np.zeros((2, 32), np.float32)},
            },
            "norm1": {"scale": np.zeros((2, 32), np.float32)},
        }}},
        # head count not divisible -> replicated, never an error
        "conv_in": {"kernel": np.zeros((3, 3, 8, 32), np.float32)},
    }
    sh = tp_lib.tp_unet_shardings(mesh, unet, heads)
    blk = sh["g"]["attentions_1"]["transformer_blocks"]
    assert blk["attn1"]["to_q"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, "model")
    assert blk["attn1"]["to_out"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model", None)
    # row-parallel bias must stay replicated (added once, post all-reduce)
    assert blk["attn1"]["to_out"]["bias"].spec == jax.sharding.PartitionSpec()
    assert blk["ff"]["geglu_proj"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, "model")
    assert blk["ff"]["geglu_proj"]["bias"].spec == jax.sharding.PartitionSpec(
        None, "model")
    assert blk["ff"]["out_proj"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model", None)
    assert blk["norm1"]["scale"].spec == jax.sharding.PartitionSpec()
    assert sh["conv_in"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_tp_generate_matches_single_device(pipe, rng):
    """TP-2 (and TP-2 x DP-2) generate == single-device generate.

    The tiny config has 2 attention heads, so 'model' is capped at 2; the
    full audioldm2-large config (8 heads) admits TP-2/4/8 with the same
    rules. GSPMD may re-associate the out-projection partial sums, hence
    the (tight) fp32 tolerance instead of exact equality."""

    cfg = pipe.config
    b = 2
    pos, neg = _text(rng, cfg, b=b), _text(rng, cfg, b=b)
    fbank = jnp.asarray(
        rng.standard_normal((b, *cfg.audiomae.img_size)).astype(np.float32))
    kw = dict(audio_length_in_s=0.2, num_inference_steps=2, guidance_scale=3.0,
              ap_scale=0.5, time_pool=2, freq_pool=2, seed=0)

    ref = pipe.generate(pos, neg, fbank, **kw)

    for data, model in ((1, 2), (2, 2)):
        mesh = mesh_lib.create_mesh(
            data=data, model=model, devices=jax.devices()[: data * model])
        tp_pipe = AudioLDM2Pipeline(tiny_pipeline_config(), pipe.params,
                                    mesh=mesh, tensor_parallel=True)
        assert tp_pipe.config.unet.force_xla_core
        # the UNet transformer weights must REALLY be sharded...
        n_sharded = tp_lib.count_sharded_leaves(tp_pipe.params["unet"])
        assert n_sharded >= 40, n_sharded
        q = tp_pipe.params["unet"]["down_1_attn_0"]["attentions_1"][
            "transformer_blocks"]["attn1"]["to_q"]["kernel"]
        shard_shapes = {s.data.shape for s in q.addressable_shards}
        assert shard_shapes == {(q.shape[0], q.shape[1], q.shape[2] // model)}

        out = tp_pipe.generate(pos, neg, fbank, **kw)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_tp_requires_model_axis(pipe):
    with pytest.raises(ValueError):
        AudioLDM2Pipeline(tiny_pipeline_config(), pipe.params,
                          mesh=mesh_lib.create_mesh(), tensor_parallel=True)


def test_tp_cli(tmp_path, rng):
    """`--tensor-parallel 2` end-to-end from the task CLI."""

    import os

    from scipy.io import wavfile

    from ap_adapter_tpu.pipeline import tasks

    src = tmp_path / "source.wav"
    wavfile.write(str(src), 16000,
                  (rng.standard_normal(3200) * 8000).astype(np.int16))
    out = tmp_path / "out"
    tasks.main([
        "--task", "timbre_transfer", "--tiny", "--random-weights",
        "--tensor-parallel", "2",
        "--audio-prompt", str(src), "--output-dir", str(out),
        "--num-files", "1", "--steps", "2", "--audio-length", "0.2",
        "--prompt", "trumpet", "--time-pool", "2", "--freq-pool", "2",
    ])
    wavs = sorted(os.listdir(out))
    assert len(wavs) == 1 and wavs[0].endswith(".wav")
