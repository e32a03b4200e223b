"""Parity tests for the conditioning stack vs transformers (torch, CPU).

Small random-initialized HF models are the golden references; weights are
converted with convert/torch_import.py and outputs compared.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ap_adapter_tpu import configs
from ap_adapter_tpu.models.clap import ClapTextEncoder
from ap_adapter_tpu.models.t5 import T5Encoder
from ap_adapter_tpu.models.gpt2 import GPT2Model, generate_hidden_states
from ap_adapter_tpu.models.projection import ProjectionModel
from ap_adapter_tpu.convert import torch_import as ti


pytestmark = pytest.mark.quick

def _np_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# CLAP text
# ---------------------------------------------------------------------------


def test_clap_text_parity(rng):
    from transformers import ClapTextConfig as HFClapTextConfig
    from transformers.models.clap.modeling_clap import ClapTextModelWithProjection

    hf_cfg = HFClapTextConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64, projection_dim=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = ClapTextModelWithProjection(hf_cfg).eval()

    ids = np.array([[5, 9, 17, 33, 2, 1, 1, 1], [5, 44, 2, 1, 1, 1, 1, 1]], dtype=np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
        want = torch.nn.functional.normalize(out.text_embeds, dim=-1).numpy()

    cfg = configs.ClapTextConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, projection_dim=16,
    )
    params = ti.clap_text_params(_np_sd(hf), num_layers=2)
    got = np.asarray(
        ClapTextEncoder(cfg).apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------


def test_t5_encoder_parity(rng):
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=99, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    ids = np.array([[3, 7, 11, 13, 0, 0], [3, 5, 0, 0, 0, 0]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()

    cfg = configs.T5Config(
        vocab_size=99, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
    )
    params = ti.t5_encoder_params(_np_sd(hf), num_layers=3)
    got = np.asarray(T5Encoder(cfg).apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# GPT-2 + hidden-state generation loop
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gpt2_pair():
    from transformers import GPT2Config as HFGPT2Config, GPT2Model as HFGPT2Model

    hf_cfg = HFGPT2Config(
        vocab_size=50, n_embd=32, n_layer=2, n_head=2, n_positions=64,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(1)
    hf = HFGPT2Model(hf_cfg).eval()
    cfg = configs.GPT2Config(vocab_size=50, n_embd=32, n_layer=2, n_head=2, n_positions=64)
    params = ti.gpt2_params(_np_sd(hf), num_layers=2)
    return hf, cfg, params


def test_gpt2_forward_parity(gpt2_pair, rng):
    hf, cfg, params = gpt2_pair
    embeds = rng.standard_normal((2, 5, 32)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        want = hf(
            inputs_embeds=torch.from_numpy(embeds), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    got, _ = GPT2Model(cfg).apply(
        {"params": params}, jnp.asarray(embeds), attention_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_gpt2_generate_parity(gpt2_pair, rng):
    """Replicates the reference AR hidden-state loop
    (pipeline_audioldm2.py:231-270) in torch and checks the scan version."""

    hf, cfg, params = gpt2_pair
    steps = 4
    embeds = rng.standard_normal((2, 5, 32)).astype(np.float32)
    mask = np.ones((2, 5), dtype=np.int64)

    with torch.no_grad():
        inputs = torch.from_numpy(embeds)
        attn = torch.from_numpy(mask)
        past = None
        for _ in range(steps):
            cur = inputs if past is None else inputs[:, -1:]
            out = hf(inputs_embeds=cur, attention_mask=attn, past_key_values=past, use_cache=True)
            past = out.past_key_values
            inputs = torch.cat([inputs, out.last_hidden_state[:, -1:]], dim=1)
            attn = torch.cat([attn, torch.ones(2, 1, dtype=torch.long)], dim=-1)
        want = inputs[:, -steps:].numpy()

    got = generate_hidden_states(
        GPT2Model(cfg), params, jnp.asarray(embeds), jnp.asarray(mask), max_new_tokens=steps
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Projection model
# ---------------------------------------------------------------------------


def test_projection_model(rng):
    cfg = configs.ProjectionConfig(text_encoder_dim=8, text_encoder_1_dim=12, language_model_dim=16)
    model = ProjectionModel(cfg)
    clap = rng.standard_normal((2, 1, 8)).astype(np.float32)
    t5 = rng.standard_normal((2, 4, 12)).astype(np.float32)
    cm = np.ones((2, 1), dtype=np.int32)
    tm = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(clap), jnp.asarray(t5), jnp.asarray(cm), jnp.asarray(tm))["params"]
    hidden, mask = model.apply({"params": params}, jnp.asarray(clap), jnp.asarray(t5), jnp.asarray(cm), jnp.asarray(tm))
    assert hidden.shape == (2, (1 + 2) + (4 + 2), 16)
    assert mask.shape == (2, 9)
    # SOS/EOS positions are attended
    np.testing.assert_array_equal(np.asarray(mask[:, 0]), 1)
    np.testing.assert_array_equal(np.asarray(mask[:, 3]), 1)

    # torch-style reference via independent numpy computation
    w = np.asarray(params["projection"]["kernel"])
    b = np.asarray(params["projection"]["bias"])
    want_clap = clap @ w + b
    np.testing.assert_allclose(np.asarray(hidden[:, 1:2]), want_clap, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hidden[:, 0]), np.ones((2, 16)), rtol=1e-6)
