"""Speculative decoding: output equals target-greedy; stats sane."""

import jax
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
from mixq_tensorrt_llm_tpu.runtime import GenerationSession
from mixq_tensorrt_llm_tpu.runtime.speculative import speculative_generate


def cfg_of(layers, seed_unused=0):
    return ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_layers=layers, num_heads=4, num_kv_heads=2,
                       head_dim=16, max_position_embeddings=128,
                       quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4))


@pytest.fixture(scope="module")
def models():
    tcfg = cfg_of(3)
    tparams = mllama.init_random_params(tcfg, jax.random.PRNGKey(0))
    dcfg = cfg_of(1)
    dparams = mllama.init_random_params(dcfg, jax.random.PRNGKey(1))
    return tparams, tcfg, dparams, dcfg


def target_greedy(tparams, tcfg, prompt, n):
    sess = GenerationSession(tparams, tcfg, max_seq_len=64,
                             prefill_buckets=(8,), use_flash_prefill=False)
    return sess.generate([prompt], max_new_tokens=n).sequences[0]


class TestSpeculative:
    def test_output_equals_target_greedy(self, models):
        tparams, tcfg, dparams, dcfg = models
        prompt = [1, 2, 3, 4]
        want = target_greedy(tparams, tcfg, prompt, 10)
        got, stats = speculative_generate(tparams, tcfg, dparams, dcfg,
                                          prompt, 10, gamma=3,
                                          max_seq_len=64)
        assert got == want
        assert stats.proposed > 0
        assert 0.0 <= stats.acceptance_rate <= 1.0

    def test_self_draft_accepts_everything(self, models):
        """Draft == target -> near-total acceptance; output may differ from
        step-by-step greedy only at bf16 logit near-ties (batched verify vs
        single-token decode round differently), so compare loosely."""
        tparams, tcfg, _, _ = models
        prompt = [9, 8, 7]
        want = target_greedy(tparams, tcfg, prompt, 8)
        got, stats = speculative_generate(tparams, tcfg, tparams, tcfg,
                                          prompt, 8, gamma=4,
                                          max_seq_len=64)
        assert len(got) == len(want)
        mism = sum(a != b for a, b in zip(got, want))
        assert mism <= 1, (got, want)
        assert stats.acceptance_rate > 0.7, stats

    def test_eos_stops(self, models):
        tparams, tcfg, dparams, dcfg = models
        base = target_greedy(tparams, tcfg, [1, 2], 8)
        eos = base[4]   # a token that will be generated
        got, _ = speculative_generate(tparams, tcfg, dparams, dcfg,
                                      [1, 2], 8, gamma=3, eos_token_id=eos,
                                      max_seq_len=64)
        assert got[-1] == eos or len(got) - 2 == 8
        assert eos not in got[2:-1]
