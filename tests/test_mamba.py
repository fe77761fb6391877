"""Mamba (selective SSM) family: HF logits parity, recurrent-state decode
consistency, quantized forward, session generation.

Reference parity target: tensorrt_llm/models/mamba/ (the reference zoo's
non-attention family). The associative-scan prefill and the single-step
decode update must agree — the same invariant the reference's conv/ssm
state slots encode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import forward, init_kv_cache, registry
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig

torch = pytest.importorskip("torch")

TOKENS = np.array([[1, 5, 9, 42, 7, 100, 3, 200]], np.int32)


@pytest.fixture(scope="module")
def setup():
    from transformers import MambaConfig, MambaForCausalLM
    hf_cfg = MambaConfig(vocab_size=256, hidden_size=64, state_size=8,
                         num_hidden_layers=2, conv_kernel=4, expand=2,
                         time_step_rank=4, use_bias=False,
                         use_conv_bias=True, pad_token_id=0,
                         bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    model = MambaForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = registry.config_from_hf(hf_cfg)
    return model, sd, cfg


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


def test_prefill_decode_state_consistency(setup):
    """prefill(5) + 3 single-token decodes == full prefill(8): the conv
    carry and SSM state round-trip through the KVCache container."""
    _, sd, cfg = setup
    params = registry.params_from_hf(cfg, sd)
    full, _ = _logits(cfg, params)

    b, s = TOKENS.shape
    cache = init_kv_cache(cfg, b, 16)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    _, cache = forward(params, cfg, jnp.asarray(TOKENS), pos, cache,
                       jnp.full((b,), 5, jnp.int32))
    for t in range(5, 8):
        last, cache = forward(params, cfg, jnp.asarray(TOKENS[:, t:t + 1]),
                              jnp.full((b, 1), t, jnp.int32), cache,
                              jnp.full((b,), t + 1, jnp.int32))
    np.testing.assert_allclose(np.asarray(last[:, 0]), full[:, -1],
                               rtol=2e-2, atol=2e-2)


def test_padded_lanes_do_not_pollute_state(setup):
    """A right-padded short sequence in a batch matches its solo run —
    pads must leave conv/SSM state untouched (dt = 0 identity update)."""
    _, sd, cfg = setup
    params = registry.params_from_hf(cfg, sd)
    solo, _ = _logits(cfg, params, TOKENS[:, :5], valid=5)

    padded = np.zeros((1, 8), np.int32)
    padded[0, :5] = TOKENS[0, :5]
    got, _ = _logits(cfg, params, padded, valid=5)
    np.testing.assert_allclose(got[:, :5], solo[:, :5], rtol=2e-2, atol=2e-2)


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

    # step-by-step greedy from the session equals a manual state walk
    manual = [1, 5, 9]
    b = 1
    cache = init_kv_cache(cfg, b, 16)
    toks = np.zeros((1, 8), np.int32)
    toks[0, :3] = manual
    pos = jnp.tile(jnp.arange(8), (b, 1))
    logits, cache = forward(params, cfg, jnp.asarray(toks), pos, cache,
                            jnp.full((b,), 3, jnp.int32))
    cur = int(np.asarray(logits)[0, 2].argmax())
    manual.append(cur)
    for t in range(3, 8):
        logits, cache = forward(params, cfg,
                                jnp.asarray([[cur]], jnp.int32),
                                jnp.full((b, 1), t, jnp.int32), cache,
                                jnp.full((b,), t + 1, jnp.int32))
        cur = int(np.asarray(logits)[0, 0].argmax())
        manual.append(cur)
    assert out.sequences[0] == manual


def test_random_init_random_tokens_finite():
    cfg = registry.config_from_hf(__import__("transformers").MambaConfig(
        vocab_size=128, hidden_size=32, state_size=4, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=2, pad_token_id=0,
        bos_token_id=1, eos_token_id=2))
    params = registry.init_random_params(cfg, jax.random.PRNGKey(0))
    got, _ = _logits(cfg, params, np.array([[3, 1, 4, 1, 5]], np.int32))
    assert np.isfinite(got).all()


def test_llm_checkpoint_roundtrip(setup, tmp_path):
    """HF dir -> LLM(quant=int8_mix) -> saved checkpoint (required-name
    validation incl. the mamba schema) -> reload -> identical greedy."""
    from transformers import MambaConfig, MambaForCausalLM
    from mixq_tensorrt_llm_tpu.api import LLM
    d = tmp_path / "hf"
    torch.manual_seed(0)
    MambaForCausalLM(MambaConfig(
        vocab_size=256, hidden_size=64, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, pad_token_id=0,
        bos_token_id=1, eos_token_id=2)).eval().save_pretrained(str(d))
    kw = dict(quant="int8_mix", max_seq_len=64,
              cache_dir=str(tmp_path / "cache"))
    out = LLM(str(d), **kw).generate_tokens([[1, 5, 9]], max_new_tokens=6)
    out2 = LLM(str(d), **kw).generate_tokens([[1, 5, 9]], max_new_tokens=6)
    assert out.sequences == out2.sequences


def test_paged_executor_rejected(setup):
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
    _, sd, cfg = setup
    params = registry.params_from_hf(cfg, sd)
    ex = Executor(params, cfg, max_batch=1, max_seq_len=32, block_size=8,
                  prefill_chunk=8)
    ex.submit([1, 2, 3], max_new_tokens=2)
    with pytest.raises(NotImplementedError, match="mamba"):
        ex.step()
