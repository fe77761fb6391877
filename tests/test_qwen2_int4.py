"""Qwen2 HF-parity and int4 (packed) end-to-end model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import (ModelConfig, forward, init_kv_cache,
                                          llama as mllama)
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
from mixq_tensorrt_llm_tpu.quant import core as qcore


class TestQwen2HFParity:
    def test_logits_match_transformers(self):
        torch = pytest.importorskip("torch")
        from transformers import Qwen2Config, Qwen2ForCausalLM
        hf_cfg = Qwen2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            rope_theta=1000000.0, tie_word_embeddings=False,
            attn_implementation="eager")
        torch.manual_seed(0)
        model = Qwen2ForCausalLM(hf_cfg).eval().float()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

        cfg = mllama.config_from_hf(hf_cfg)
        assert cfg.arch == "qwen2" and cfg.qkv_bias
        params = mllama.params_from_hf(cfg, sd)
        assert "b" in params["layers"]["qkv_proj"]

        tokens = np.array([[3, 17, 200, 5, 90, 41]], np.int32)
        with torch.no_grad():
            hf_logits = model(torch.tensor(tokens, dtype=torch.long)
                              ).logits.numpy()
        cache = init_kv_cache(cfg, 1, 8)
        pos = jnp.arange(6)[None]
        logits, _ = forward(params, cfg, jnp.asarray(tokens), pos, cache,
                            jnp.array([6], jnp.int32))
        got = np.asarray(logits)
        np.testing.assert_allclose(got, hf_logits, rtol=0.1, atol=0.15)
        assert (got.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


class TestInt4Model:
    def _cfg(self, packed_note):
        return ModelConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            max_position_embeddings=64,
            quant=QuantConfig(algo=QuantAlgo.INT4_MIX, num_outliers=16))

    def test_int4_mix_forward_and_generation(self):
        cfg = self._cfg("packed-default")
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        lp = params["layers"]
        # int4 weights ship PACKED two-per-byte by default (the capacity
        # story: BASELINE's 13B W4A16 on a 16 GB chip); nibbles unpack to
        # the int4 range [-8, 7]
        q = np.asarray(qcore.unpack_int4(lp["qkv_proj"]["qweight_packed"][0]))
        assert q.min() >= -8 and q.max() <= 7
        # down_proj routed to W4A16
        assert "fp_ind" not in lp["down_proj"]

        from mixq_tensorrt_llm_tpu.runtime import GenerationSession
        sess = GenerationSession(params, cfg, max_seq_len=32,
                                 prefill_buckets=(8,))
        out = sess.generate([[1, 2, 3]], max_new_tokens=5)
        assert len(out.sequences[0]) == 8

    def test_packed_int4_matches_unpacked(self):
        """Packed (default) and unpacked int4 storage give identical
        logits — packing is a pure layout change."""
        cfg = self._cfg("packed-default")
        packed = mllama.init_random_params(cfg, jax.random.PRNGKey(1))

        def unpack_tree(p):
            p2 = jax.tree.map(lambda x: x, p)   # shallow-ish copy
            for mod in ("qkv_proj", "o_proj", "gate_up_proj", "down_proj"):
                t = dict(p2["layers"][mod])
                qp = t.pop("qweight_packed")
                t["qweight"] = jnp.stack(
                    [qcore.unpack_int4(qp[i]) for i in range(qp.shape[0])])
                p2["layers"][mod] = t
            return p2

        params = unpack_tree(packed)
        tokens = jnp.array([[5, 6, 7, 8]], jnp.int32)
        pos = jnp.arange(4)[None]
        lens = jnp.array([4], jnp.int32)
        la, _ = forward(params, cfg, tokens, pos, init_kv_cache(cfg, 1, 8),
                        lens)
        lb, _ = forward(packed, cfg, tokens, pos, init_kv_cache(cfg, 1, 8),
                        lens)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
