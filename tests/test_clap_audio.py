"""CLAP audio tower (HTSAT Swin) parity vs transformers (torch, CPU)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ap_adapter_tpu.configs import ClapAudioConfig
from ap_adapter_tpu.models.clap_audio import ClapAudioTower, bicubic_resize_matrix
from ap_adapter_tpu.audio.mel import clap_log_mel
from ap_adapter_tpu.convert.torch_import import clap_audio_params


def test_bicubic_matrix_matches_torch(rng):
    x = rng.standard_normal((1, 1, 37, 5)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), (64, 5), mode="bicubic", align_corners=True
    ).numpy()
    m = bicubic_resize_matrix(37, 64)
    got = np.einsum("ot,bctf->bcof", m, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("time_len", [256, 200])  # exact and interpolated
def test_clap_audio_tower_parity(rng, time_len):
    from transformers import ClapAudioConfig as HFClapAudioConfig
    from transformers.models.clap.modeling_clap import ClapAudioModelWithProjection

    hf_cfg = HFClapAudioConfig(
        spec_size=64,
        patch_size=4,
        patch_stride=[4, 4],
        patch_embeds_hidden_size=16,
        depths=[2, 2],
        num_attention_heads=[2, 4],
        window_size=4,
        num_mel_bins=16,
        mlp_ratio=2.0,
        projection_dim=8,
        hidden_size=32,  # patch_embeds_hidden_size * 2**(len(depths)-1)
        enable_fusion=False,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf = ClapAudioModelWithProjection(hf_cfg).eval()
    # randomize batch-norm running stats + rel-pos tables so parity is nontrivial
    with torch.no_grad():
        bn = hf.audio_model.audio_encoder.batch_norm
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        for mod in hf.modules():
            if hasattr(mod, "relative_position_bias_table"):
                mod.relative_position_bias_table.normal_(0, 0.5)

    # input mel: [B, 1, T, F] with freq == num_mel_bins
    feats = rng.standard_normal((2, 1, time_len, 16)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(feats)).audio_embeds
        want = torch.nn.functional.normalize(want, dim=-1).numpy()

    cfg = ClapAudioConfig(
        spec_size=64, patch_size=4, patch_stride=(4, 4), patch_embeds_hidden_size=16,
        depths=(2, 2), num_heads=(2, 4), window_size=4, num_mel_bins=16,
        mlp_ratio=2.0, projection_dim=8,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = clap_audio_params(sd, cfg)
    got = np.asarray(ClapAudioTower(cfg).apply({"params": params}, jnp.asarray(feats)))
    assert got.shape == want.shape == (2, 8)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_clap_log_mel_matches_hf_extractor(rng):
    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor(truncation="rand_trunc", padding="repeatpad")
    wav = (rng.standard_normal(48_000) * 0.2).astype(np.float64)
    want = fe._np_extract_fbank_features(wav, fe.mel_filters_slaney)
    got = np.asarray(clap_log_mel(jnp.asarray(wav.astype(np.float32))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=2e-3)


def test_clap_scorer_rank(rng):
    """End-to-end scorer with random weights: shapes + deterministic ranking."""

    import jax
    from ap_adapter_tpu.configs import ClapTextConfig
    from ap_adapter_tpu.eval.clap_scoring import ClapScorer
    from ap_adapter_tpu.models.clap import ClapTextEncoder
    from ap_adapter_tpu.models.clap_audio import ClapAudioTower
    from ap_adapter_tpu.utils.init import fast_init

    tcfg = ClapTextConfig(
        vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=32, projection_dim=8,
        max_length=8,
    )
    acfg = ClapAudioConfig(
        spec_size=64, patch_size=4, patch_stride=(4, 4), patch_embeds_hidden_size=8,
        depths=(1, 1), num_heads=(2, 2), window_size=4, num_mel_bins=16,
        mlp_ratio=1.0, projection_dim=8, sampling_rate=8000, hop_length=80,
        n_fft=256, max_length_s=1,
    )
    import jax.numpy as jnp2
    tparams = fast_init(lambda k: ClapTextEncoder(tcfg).init(
        k, jnp2.ones((1, 4), jnp2.int32), jnp2.ones((1, 4), jnp2.int32)))["params"]
    aparams = fast_init(lambda k: ClapAudioTower(acfg).init(
        k, jnp2.zeros((1, 1, 101, 16))))["params"]

    scorer = ClapScorer(tcfg, acfg, {"text": tparams, "audio": aparams})
    ids = np.ones((1, 8), np.int32) * 3
    mask = np.ones((1, 8), np.int32)
    wavs = [rng.standard_normal(8000).astype(np.float32) * 0.1 for _ in range(3)]
    order = scorer.rank(ids, mask, wavs, 8000)
    assert sorted(order.tolist()) == [0, 1, 2]
    order2 = scorer.rank(ids, mask, wavs, 8000)
    np.testing.assert_array_equal(order, order2)
