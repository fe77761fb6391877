"""BERT encoder: HF parity (hidden states + pooled) and quantized run.

Reference parity target: tensorrt_llm/models/bert (encoder-only branch).
Post-norm blocks, learned+type embeddings, padded-batch masking.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import bert as mbert
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig

torch = pytest.importorskip("torch")

TOKENS = np.array([[101, 5, 9, 42, 7, 102, 0, 0],
                   [101, 8, 3, 102, 0, 0, 0, 0]], np.int32)
LENS = [6, 4]


@pytest.fixture(scope="module")
def setup():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, max_position_embeddings=64,
                        type_vocab_size=2, attn_implementation="eager")
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd, mbert.config_from_hf(hf_cfg)


def test_hf_parity(setup):
    model, sd, cfg = setup
    params = mbert.params_from_hf(cfg, sd)
    att = torch.zeros(2, 8, dtype=torch.long)
    for i, l in enumerate(LENS):
        att[i, :l] = 1
    with torch.no_grad():
        out = model(input_ids=torch.tensor(TOKENS, dtype=torch.long),
                    attention_mask=att)
    hidden, pooled = mbert.forward(params, cfg, jnp.asarray(TOKENS),
                                   jnp.asarray(LENS, jnp.int32))
    for i, l in enumerate(LENS):   # padded positions differ; compare valid
        np.testing.assert_allclose(
            np.asarray(hidden)[i, :l],
            out.last_hidden_state.numpy()[i, :l], rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(),
                               rtol=5e-2, atol=5e-2)


def test_int8_mix_close(setup):
    _, sd, cfg = setup
    base, _ = mbert.forward(mbert.params_from_hf(cfg, sd), cfg,
                            jnp.asarray(TOKENS),
                            jnp.asarray(LENS, jnp.int32))
    cfg_q = dataclasses.replace(
        cfg, quant=QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8))
    got, _ = mbert.forward(mbert.params_from_hf(cfg_q, sd), cfg_q,
                           jnp.asarray(TOKENS),
                           jnp.asarray(LENS, jnp.int32))
    assert np.abs(np.asarray(got)[0, :6] - np.asarray(base)[0, :6]).max() \
        < 1.0


def test_encoder_api_from_hf_dir(tmp_path):
    """api.Encoder loads an HF BERT dir and reproduces the direct
    forward (reference bert branch hlapi-style entry)."""
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel
    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=32)
    torch.manual_seed(0)
    model = BertModel(hf_cfg)
    d = str(tmp_path / "bert")
    model.save_pretrained(d)

    from mixq_tensorrt_llm_tpu.api import Encoder
    enc = Encoder(d)
    hidden, pooled = enc.encode_tokens([[3, 4, 5], [6, 7]])
    assert hidden.shape == (2, 3, 32) and pooled.shape == (2, 32)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = mbert.config_from_hf(hf_cfg)
    params = mbert.params_from_hf(cfg, sd)
    import jax.numpy as jnp
    toks = np.array([[3, 4, 5], [6, 7, 0]], np.int32)
    want_h, want_p = mbert.forward(params, cfg, jnp.asarray(toks),
                                   jnp.asarray([3, 2], jnp.int32))
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
