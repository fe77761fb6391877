"""T5 encoder-decoder: HF logits parity and greedy generation match.

Reference parity target: tensorrt_llm/models/enc_dec/ (T5/BART branch).
Covers both the relu and the v1.1 gated-gelu feed-forward variants, the
relative-position-bias buckets, cross attention over padded encoder
batches, and the step-by-step decoder cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import t5 as mt5
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig

torch = pytest.importorskip("torch")

ENC = np.array([[4, 9, 12, 7, 30, 2, 1, 0],
                [5, 6, 7, 1, 0, 0, 0, 0]], np.int32)
ENC_LENS = [7, 4]
DEC = np.array([[0, 11, 22, 33], [0, 44, 55, 66]], np.int32)


def build(gated=False):
    from transformers import T5Config, T5ForConditionalGeneration
    hf_cfg = T5Config(
        vocab_size=96, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=True, pad_token_id=0, eos_token_id=1,
        decoder_start_token_id=0)
    torch.manual_seed(0)
    model = T5ForConditionalGeneration(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = mt5.config_from_hf(hf_cfg)
    return model, sd, cfg


@pytest.mark.parametrize("gated", [False, True])
def test_hf_logits_parity(gated):
    model, sd, cfg = build(gated)
    params = mt5.params_from_hf(cfg, sd)

    att = torch.zeros(2, 8, dtype=torch.long)
    for i, l in enumerate(ENC_LENS):
        att[i, :l] = 1
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ENC, dtype=torch.long),
                     attention_mask=att,
                     decoder_input_ids=torch.tensor(DEC, dtype=torch.long)
                     ).logits.numpy()

    enc_h = mt5.encode(params, cfg, jnp.asarray(ENC),
                       jnp.asarray(ENC_LENS, jnp.int32))
    ek, ev = mt5.cross_kv(params, cfg, enc_h)
    sdec = DEC.shape[1]
    sk = jnp.zeros((cfg.num_decoder_layers, 2, sdec, cfg.num_heads,
                    cfg.d_kv), jnp.float32)
    logits, _, _ = mt5.decode(params, cfg, jnp.asarray(DEC),
                              jnp.arange(sdec, dtype=jnp.int32), sk,
                              jnp.zeros_like(sk),
                              jnp.full((2,), sdec, jnp.int32), ek, ev,
                              jnp.asarray(ENC_LENS, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), want,
                               rtol=5e-2, atol=5e-2)


def test_generate_matches_hf():
    model, sd, cfg = build(False)
    params = mt5.params_from_hf(cfg, sd)
    att = torch.zeros(2, 8, dtype=torch.long)
    for i, l in enumerate(ENC_LENS):
        att[i, :l] = 1
    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(ENC, dtype=torch.long),
            attention_mask=att, max_new_tokens=8, do_sample=False,
            num_beams=1).numpy()
    got = mt5.t5_generate(params, cfg,
                          [list(ENC[0][:7]), list(ENC[1][:4])],
                          max_new_tokens=8)
    for i in range(2):
        w = [int(x) for x in want[i]]
        if cfg.eos_token_id in w[1:]:
            w = w[:w[1:].index(cfg.eos_token_id) + 2]
        assert got[i] == w, (got[i], w)


def test_int8_mix_forward_close():
    import dataclasses
    _, sd, cfg = build(False)
    base = mt5.params_from_hf(cfg, sd)
    cfg_q = dataclasses.replace(
        cfg, quant=QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8))
    qp = mt5.params_from_hf(cfg_q, sd)

    def logits(c, p):
        enc_h = mt5.encode(p, c, jnp.asarray(ENC),
                           jnp.asarray(ENC_LENS, jnp.int32))
        ek, ev = mt5.cross_kv(p, c, enc_h)
        sdec = DEC.shape[1]
        sk = jnp.zeros((c.num_decoder_layers, 2, sdec, c.num_heads,
                        c.d_kv), jnp.float32)
        out, _, _ = mt5.decode(p, c, jnp.asarray(DEC),
                               jnp.arange(sdec, dtype=jnp.int32), sk,
                               jnp.zeros_like(sk),
                               jnp.full((2,), sdec, jnp.int32), ek, ev,
                               jnp.asarray(ENC_LENS, jnp.int32))
        return np.asarray(out)

    assert np.abs(logits(cfg_q, qp) - logits(cfg, base)).max() < 1.0


def test_random_init_generate():
    cfg = mt5.T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                       num_layers=2, num_decoder_layers=2, num_heads=4,
                       rel_buckets=8, rel_max_distance=20)
    params = mt5.init_random_params(cfg, jax.random.PRNGKey(0))
    out = mt5.t5_generate(params, cfg, [[3, 1, 4]], max_new_tokens=5)
    assert len(out[0]) >= 2


def test_seq2seq_api_from_hf_dir(tmp_path):
    """api.Seq2SeqLM loads an HF T5 dir and reproduces the direct
    t5_generate path (reference enc_dec hlapi-style entry)."""
    import torch
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration
    hf_cfg = HFT5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4,
                        d_ff=64, num_layers=2, num_decoder_layers=2,
                        decoder_start_token_id=0)
    torch.manual_seed(0)
    model = T5ForConditionalGeneration(hf_cfg)
    d = str(tmp_path / "t5")
    model.save_pretrained(d)

    from mixq_tensorrt_llm_tpu.api import Seq2SeqLM
    s2s = Seq2SeqLM(d)
    got = s2s.generate_tokens([[3, 4, 5, 6]], max_new_tokens=5)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = mt5.config_from_hf(hf_cfg)
    params = mt5.params_from_hf(cfg, sd)
    want = mt5.t5_generate(params, cfg, [[3, 4, 5, 6]], max_new_tokens=5)
    assert got == want
