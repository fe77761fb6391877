"""RecurrentGemma (Griffin) hybrid: HF parity, state consistency, windows.

Reference parity target: tensorrt_llm/models/recurrentgemma/. Divergence
covered below: HF prefill is full-causal (window enforced only by its
rolling decode cache); here the window masks prefill too, so HF parity is
tested with attention_window_size >= prompt length and the small-window
behavior is pinned by our own prefill-vs-decode consistency.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import forward, init_kv_cache, registry
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig

torch = pytest.importorskip("torch")

TOKENS = np.array([[1, 5, 9, 42, 7, 100, 3, 200, 17, 33, 21, 9]], np.int32)


def hf_pair(window=16):
    from transformers import (RecurrentGemmaConfig,
                              RecurrentGemmaForCausalLM)
    hf_cfg = RecurrentGemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=192,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, lru_width=64, attention_window_size=window,
        conv1d_width=4, logits_soft_cap=30.0, partial_rotary_factor=0.5,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    model = RecurrentGemmaForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd, registry.config_from_hf(hf_cfg)


@pytest.fixture(scope="module")
def setup():
    return hf_pair()


def _logits(cfg, params, tokens=TOKENS, valid=None):
    b, s = tokens.shape
    cache = init_kv_cache(cfg, b, 16)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    lens = jnp.full((b,), valid or s, jnp.int32)
    out, cache = forward(params, cfg, jnp.asarray(tokens), pos, cache, lens)
    return np.asarray(out), cache


def test_hf_logits_parity(setup):
    model, sd, cfg = setup
    params = registry.params_from_hf(cfg, sd)
    with torch.no_grad():
        hf = model(torch.tensor(TOKENS, dtype=torch.long)).logits.numpy()
    got, _ = _logits(cfg, params)
    np.testing.assert_allclose(got, hf, rtol=0.1, atol=0.15)


@pytest.mark.parametrize("window", [16, 4])
def test_prefill_decode_state_consistency(window):
    """Conv carry + RG-LRU state + windowed KV round-trip: prefill(7) then
    5 decodes equals full prefill — including a window smaller than the
    sequence (the case where we diverge from HF's full-causal prefill)."""
    _, sd, cfg = hf_pair(window)
    params = registry.params_from_hf(cfg, sd)
    full, _ = _logits(cfg, params)

    b, s = TOKENS.shape
    cache = init_kv_cache(cfg, b, 16)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    _, cache = forward(params, cfg, jnp.asarray(TOKENS), pos, cache,
                       jnp.full((b,), 7, jnp.int32))
    for t in range(7, s):
        last, cache = forward(params, cfg, jnp.asarray(TOKENS[:, t:t + 1]),
                              jnp.full((b, 1), t, jnp.int32), cache,
                              jnp.full((b,), t + 1, jnp.int32))
    np.testing.assert_allclose(np.asarray(last[:, 0]), full[:, -1],
                               rtol=3e-2, atol=3e-2)


def test_padded_lanes_do_not_pollute_state(setup):
    _, sd, cfg = setup
    params = registry.params_from_hf(cfg, sd)
    solo, _ = _logits(cfg, params, TOKENS[:, :7], valid=7)
    padded = np.zeros((1, 12), np.int32)
    padded[0, :7] = TOKENS[0, :7]
    got, _ = _logits(cfg, params, padded, valid=7)
    np.testing.assert_allclose(got[:, :7], solo[:, :7], rtol=3e-2, atol=3e-2)


def test_int8_mix_forward_close(setup):
    _, sd, cfg = setup
    ref, _ = _logits(cfg, registry.params_from_hf(cfg, sd))
    cfg_q = dataclasses.replace(
        cfg, quant=QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8))
    got, _ = _logits(cfg_q, registry.params_from_hf(cfg_q, sd))
    assert np.abs(got - ref).max() < 1.0


def test_session_generate(setup):
    from mixq_tensorrt_llm_tpu.runtime import GenerationSession
    _, sd, cfg = setup
    params = registry.params_from_hf(cfg, sd)
    sess = GenerationSession(params, cfg, max_seq_len=32,
                             prefill_buckets=(8,))
    out = sess.generate([[1, 5, 9], [4, 2, 7, 7, 1]], 6)
    assert [len(s) for s in out.sequences] == [9, 11]


def test_random_init_finite():
    from transformers import RecurrentGemmaConfig
    cfg = registry.config_from_hf(RecurrentGemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, lru_width=32, attention_window_size=8,
        pad_token_id=0, bos_token_id=1, eos_token_id=2))
    params = registry.init_random_params(cfg, jax.random.PRNGKey(0))
    got, _ = _logits(cfg, params, np.array([[3, 1, 4, 1, 5]], np.int32))
    assert np.isfinite(got).all()


def test_llm_checkpoint_roundtrip(tmp_path):
    from transformers import RecurrentGemmaConfig, RecurrentGemmaForCausalLM
    from mixq_tensorrt_llm_tpu.api import LLM
    d = tmp_path / "hf"
    torch.manual_seed(0)
    RecurrentGemmaForCausalLM(RecurrentGemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=192,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, lru_width=64, attention_window_size=16,
        conv1d_width=4, pad_token_id=0, bos_token_id=1,
        eos_token_id=2)).eval().save_pretrained(str(d))
    kw = dict(quant="int8_mix", max_seq_len=64,
              cache_dir=str(tmp_path / "cache"))
    out = LLM(str(d), **kw).generate_tokens([[1, 5, 9]], max_new_tokens=6)
    out2 = LLM(str(d), **kw).generate_tokens([[1, 5, 9]], max_new_tokens=6)
    assert out.sequences == out2.sequences
