"""Model-level tests: HF logits parity, quantized forward sanity, and
prefill/decode consistency on tiny random Llama & Qwen2 configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, init_kv_cache, forward
from mixq_tensorrt_llm_tpu.models import llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig, KVCacheQuantAlgo


TINY = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position_embeddings=128, rms_norm_eps=1e-5)


def tiny_cfg(**kw):
    base = dict(TINY)
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def hf_model_and_dict():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=TINY["vocab_size"], hidden_size=TINY["hidden_size"],
        intermediate_size=TINY["intermediate_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        num_key_value_heads=TINY["num_kv_heads"],
        head_dim=TINY["head_dim"],
        max_position_embeddings=TINY["max_position_embeddings"],
        rms_norm_eps=TINY["rms_norm_eps"], tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd, hf_cfg


class TestHFParity:
    def test_unquantized_logits_match_hf(self, hf_model_and_dict):
        import torch
        model, sd, hf_cfg = hf_model_and_dict
        cfg = mllama.config_from_hf(hf_cfg)
        assert cfg.num_kv_heads == TINY["num_kv_heads"]
        params = mllama.params_from_hf(cfg, sd)

        tokens = np.array([[1, 5, 9, 42, 7, 100, 3, 200]], np.int32)
        with torch.no_grad():
            hf_logits = model(torch.tensor(tokens, dtype=torch.long)
                              ).logits.numpy()

        b, s = tokens.shape
        cache = init_kv_cache(cfg, b, 16)
        pos = jnp.tile(jnp.arange(s), (b, 1))
        logits, _ = forward(params, cfg, jnp.asarray(tokens), pos, cache,
                            jnp.full((b,), s, jnp.int32))
        got = np.asarray(logits)
        # bf16 activations vs fp32 HF: compare top-1 agreement + loose numeric
        np.testing.assert_allclose(got, hf_logits, rtol=0.1, atol=0.15)
        assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95

    def test_int8_mix_logits_close(self, hf_model_and_dict):
        import torch
        model, sd, hf_cfg = hf_model_and_dict
        quant = QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8)
        cfg = mllama.config_from_hf(hf_cfg, quant)
        params = mllama.params_from_hf(cfg, sd)
        # quantized schema sanity
        lp = params["layers"]
        assert lp["qkv_proj"]["qweight"].dtype == jnp.int8
        assert lp["qkv_proj"]["fp_ind"].shape == (cfg.num_layers, 8)
        assert lp["down_proj"]["qweight"].dtype == jnp.int8  # weight-only
        assert "fp_ind" not in lp["down_proj"]

        tokens = np.array([[1, 5, 9, 42, 7, 100, 3, 200]], np.int32)
        with torch.no_grad():
            hf_logits = model(torch.tensor(tokens, dtype=torch.long)
                              ).logits.numpy()
        b, s = tokens.shape
        cache = init_kv_cache(cfg, b, 16)
        pos = jnp.tile(jnp.arange(s), (b, 1))
        logits, _ = forward(params, cfg, jnp.asarray(tokens), pos, cache,
                            jnp.full((b,), s, jnp.int32))
        got = np.asarray(logits)
        # int8 quantization error tolerated; ranking should broadly agree
        rel = np.linalg.norm(got - hf_logits) / np.linalg.norm(hf_logits)
        assert rel < 0.2, rel
        assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() >= 0.75


class TestPrefillDecodeConsistency:
    @pytest.mark.parametrize("kv_cache", [KVCacheQuantAlgo.NONE,
                                          KVCacheQuantAlgo.INT8])
    def test_decode_matches_full_prefill(self, kv_cache):
        cfg = tiny_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4, kv_cache=kv_cache))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        b, s = 2, 10
        tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                    cfg.vocab_size)

        # one-shot prefill of the whole sequence
        cache = init_kv_cache(cfg, b, 16)
        pos = jnp.tile(jnp.arange(s), (b, 1))
        full_logits, _ = forward(params, cfg, tokens, pos, cache,
                                 jnp.full((b,), s, jnp.int32))

        # prefill 6 tokens then 4 decode steps
        cache = init_kv_cache(cfg, b, 16)
        pos6 = jnp.tile(jnp.arange(6), (b, 1))
        logits6, cache = forward(params, cfg, tokens[:, :6], pos6, cache,
                                 jnp.full((b,), 6, jnp.int32))
        step_logits = [logits6[:, -1]]
        for t in range(6, s):
            lg, cache = forward(params, cfg, tokens[:, t:t + 1],
                                jnp.full((b, 1), t, jnp.int32), cache,
                                jnp.full((b,), t + 1, jnp.int32))
            step_logits.append(lg[:, 0])

        for offset, lg in enumerate(step_logits):
            want = np.asarray(full_logits[:, 5 + offset])
            got = np.asarray(lg)
            tol = 0.3 if kv_cache == KVCacheQuantAlgo.INT8 else 2e-2
            np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def test_ragged_batch_last_token_matches_unbatched(self):
        """Left-aligned ragged prefill: each sequence's last-valid-position
        logits must equal running it alone."""
        cfg = tiny_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(2))
        t1 = jax.random.randint(jax.random.PRNGKey(3), (1, 7), 0, cfg.vocab_size)
        t2 = jax.random.randint(jax.random.PRNGKey(4), (1, 4), 0, cfg.vocab_size)

        # batched: pad t2 to 7
        tokens = jnp.concatenate(
            [t1, jnp.pad(t2, ((0, 0), (0, 3)))], axis=0)
        lens = jnp.array([7, 4], jnp.int32)
        cache = init_kv_cache(cfg, 2, 8)
        pos = jnp.tile(jnp.arange(7), (2, 1))
        logits, _ = forward(params, cfg, tokens, pos, cache, lens)
        last = np.stack([np.asarray(logits[0, 6]), np.asarray(logits[1, 3])])

        for row, t in enumerate((t1, t2)):
            cache1 = init_kv_cache(cfg, 1, 8)
            s = t.shape[1]
            lg, _ = forward(params, cfg, t, jnp.arange(s)[None], cache1,
                            jnp.array([s], jnp.int32))
            np.testing.assert_allclose(last[row], np.asarray(lg[0, -1]),
                                       rtol=2e-2, atol=2e-2)


class TestQwen2:
    def test_qwen2_bias_and_forward(self):
        cfg = tiny_cfg(arch="qwen2", qkv_bias=True,
                       quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(5))
        assert "b" in params["layers"]["qkv_proj"]
        b, s = 1, 5
        tokens = jnp.zeros((b, s), jnp.int32)
        cache = init_kv_cache(cfg, b, 8)
        logits, _ = forward(params, cfg, tokens,
                            jnp.tile(jnp.arange(s), (b, 1)), cache,
                            jnp.full((b,), s, jnp.int32))
        assert logits.shape == (b, s, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()


def test_llama3_rope_scaling_parity():
    """Llama-3.1-style rope_scaling (rope_type=llama3) matches HF logits;
    silently ignoring it would mis-rotate every head (the bug this test
    pins against real 3.1 checkpoints)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from mixq_tensorrt_llm_tpu.models import (forward, init_kv_cache,
                                              registry)
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
        attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = registry.config_from_hf(hf_cfg)
    assert cfg.rope_scaling_type == "llama3"
    params = registry.params_from_hf(cfg, sd)

    toks = np.array([[1, 5, 9, 42, 7, 100, 3, 200] * 6], np.int32)  # 48 > 32
    with torch.no_grad():
        want = model(torch.tensor(toks, dtype=torch.long)).logits.numpy()
    b, s = toks.shape
    cache = init_kv_cache(cfg, b, 64)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    got, _ = forward(params, cfg, jnp.asarray(toks), pos, cache,
                     jnp.full((b,), s, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.1, atol=0.15)


def test_yarn_rope_scaling_parity():
    """YaRN rope_scaling (Qwen long-context checkpoints) matches HF."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from mixq_tensorrt_llm_tpu.models import (forward, init_kv_cache,
                                              registry)
    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32},
        attn_implementation="eager")
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = registry.config_from_hf(hf_cfg)
    assert cfg.rope_scaling_type == "yarn"
    assert cfg.rope_attention_factor > 1.0   # 0.1*ln(4)+1
    params = registry.params_from_hf(cfg, sd)

    toks = np.array([[1, 5, 9, 42, 7, 100, 3, 200] * 6], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(toks, dtype=torch.long)).logits.numpy()
    b, s = toks.shape
    cache = init_kv_cache(cfg, b, 64)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    got, _ = forward(params, cfg, jnp.asarray(toks), pos, cache,
                     jnp.full((b,), s, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.1, atol=0.15)
