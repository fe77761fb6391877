"""Runtime tests: sampler semantics, GenerationSession end-to-end behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models import llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
from mixq_tensorrt_llm_tpu.runtime import (GenerationSession, SamplingConfig,
                                           sample)


def tiny_cfg(**kw):
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                max_position_embeddings=256)
    base.update(kw)
    return ModelConfig(**base)


class TestSampler:
    def test_greedy_argmax(self):
        logits = jnp.array([[0.1, 5.0, 0.2], [3.0, 0.0, -1.0]])
        toks = sample(logits, jax.random.PRNGKey(0), SamplingConfig())
        np.testing.assert_array_equal(np.asarray(toks), [1, 0])

    def test_top_k_restricts_support(self):
        logits = jnp.array([[0.0, 1.0, 2.0, 3.0, 4.0]] * 64)
        cfg = SamplingConfig(greedy=False, temperature=1.0, top_k=2)
        toks = sample(logits, jax.random.PRNGKey(1), cfg)
        assert set(np.asarray(toks).tolist()) <= {3, 4}

    def test_top_p_restricts_support(self):
        # one dominant token (p~0.97): top_p=0.5 must always pick it
        logits = jnp.array([[0.0, 10.0, 0.5, 0.1]] * 64)
        cfg = SamplingConfig(greedy=False, temperature=1.0, top_p=0.5)
        toks = sample(logits, jax.random.PRNGKey(2), cfg)
        assert set(np.asarray(toks).tolist()) == {1}

    def test_temperature_zero_is_greedy(self):
        logits = jnp.array([[0.0, 2.0, 1.0]])
        cfg = SamplingConfig(greedy=False, temperature=0.0)
        assert int(sample(logits, jax.random.PRNGKey(3), cfg)[0]) == 1


class TestGenerationSession:
    @pytest.fixture(scope="class")
    def session(self):
        cfg = tiny_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        return GenerationSession(params, cfg, max_seq_len=64,
                                 prefill_buckets=(8, 16, 32))

    def test_greedy_deterministic(self, session):
        prompts = [[1, 2, 3, 4, 5], [10, 20, 30]]
        out1 = session.generate(prompts, max_new_tokens=8)
        out2 = session.generate(prompts, max_new_tokens=8)
        assert out1.sequences == out2.sequences
        assert out1.num_prompt_tokens == [5, 3]
        assert all(n == 8 for n in out1.num_generated)
        # prompts preserved as prefix
        assert out1.sequences[0][:5] == prompts[0]
        assert out1.sequences[1][:3] == prompts[1]

    def test_batched_matches_single(self, session):
        """Batching must not change greedy results (ragged batch)."""
        prompts = [[1, 2, 3, 4, 5, 6, 7], [9, 8, 7]]
        batched = session.generate(prompts, max_new_tokens=5)
        for i, p in enumerate(prompts):
            solo = session.generate([p], max_new_tokens=5)
            assert solo.sequences[0] == batched.sequences[i], i

    def test_capacity_guard(self, session):
        with pytest.raises(ValueError, match="exceeds max_seq_len"):
            session.generate([[1] * 30], max_new_tokens=60)

    def test_eos_stops(self, session):
        # find what greedy generates, then use its first token as eos
        out = session.generate([[1, 2, 3]], max_new_tokens=6)
        first_gen = out.sequences[0][3]
        out2 = session.generate([[1, 2, 3]], max_new_tokens=6,
                                eos_token_id=first_gen)
        assert out2.num_generated[0] == 1
        assert out2.sequences[0] == [1, 2, 3, first_gen]

    def test_sampling_reproducible_by_seed(self, session):
        cfg = SamplingConfig(greedy=False, temperature=1.0, top_k=50)
        a = session.generate([[5, 6]], 6, sampling=cfg, seed=7)
        b = session.generate([[5, 6]], 6, sampling=cfg, seed=7)
        c = session.generate([[5, 6]], 6, sampling=cfg, seed=8)
        assert a.sequences == b.sequences
        assert a.sequences != c.sequences  # overwhelmingly likely
