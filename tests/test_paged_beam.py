"""Paged beam search (fork + copy-on-write block sharing) vs the dense path.

Reference parity: kv_cache_manager.py:66-244 shares KV blocks across beams;
the paged searcher must produce exactly the dense beam_search result while
allocating far fewer pool pages than one-cache-per-beam would.
"""

import jax
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                         KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime import GenerationSession
from mixq_tensorrt_llm_tpu.runtime.beam import beam_search, paged_beam_search


def make_model(kv_cache=KVCacheQuantAlgo.NONE):
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4, kv_cache=kv_cache))
    return mllama.init_random_params(cfg, jax.random.PRNGKey(0)), cfg


@pytest.fixture(scope="module")
def model():
    return make_model()


class TestPagedBeam:
    def test_matches_dense(self, model):
        params, cfg = model
        prompts = [[1, 2, 3, 4, 5, 6, 7], [9, 10, 11]]
        dense = beam_search(params, cfg, prompts, max_new_tokens=7,
                            num_beams=3, max_seq_len=64)
        paged = paged_beam_search(params, cfg, prompts, max_new_tokens=7,
                                  num_beams=3, max_seq_len=64, block_size=4)
        assert paged.sequences == dense.sequences
        for a, b in zip(paged.scores, dense.scores):
            assert abs(a - b) < 1e-3

    def test_matches_dense_int8_kv(self):
        params, cfg = make_model(KVCacheQuantAlgo.INT8)
        prompts = [[1, 2, 3, 4, 5]]
        dense = beam_search(params, cfg, prompts, max_new_tokens=6,
                            num_beams=2, max_seq_len=64)
        paged = paged_beam_search(params, cfg, prompts, max_new_tokens=6,
                                  num_beams=2, max_seq_len=64, block_size=4)
        assert paged.sequences == dense.sequences

    def test_block_sharing_saves_pages(self, model):
        """Long prompt, K beams: prompt blocks are written once and shared;
        the peak page count must be well under K full copies."""
        params, cfg = model
        k, bs = 4, 4
        prompt = list(range(1, 33))          # 32 tokens = 8 blocks
        res = paged_beam_search(params, cfg, [prompt], max_new_tokens=4,
                                num_beams=k, max_seq_len=64, block_size=bs)
        prompt_blocks = len(prompt) // bs
        dense_equiv = k * (prompt_blocks + 1)     # one cache per beam
        assert res.peak_blocks is not None
        # shared prefix: 8 prompt blocks + at most k COW/tail pages per beam
        assert res.peak_blocks <= prompt_blocks + 3 * k
        assert res.peak_blocks < dense_equiv / 2

    def test_eos_truncates(self, model):
        params, cfg = model
        out = paged_beam_search(params, cfg, [[1, 2]], 6, num_beams=2,
                                max_seq_len=64, block_size=4)
        tok = out.sequences[0][3]
        out2 = paged_beam_search(params, cfg, [[1, 2]], 6, num_beams=2,
                                 eos_token_id=tok, max_seq_len=64,
                                 block_size=4)
        seq = out2.sequences[0]
        assert tok not in seq[2:-1]

    def test_session_num_beams_api(self, model):
        params, cfg = model
        session = GenerationSession(params, cfg, max_seq_len=64)
        prompts = [[5, 6, 7, 8]]
        out = session.generate(prompts, max_new_tokens=5, num_beams=3)
        want = beam_search(params, cfg, prompts, max_new_tokens=5,
                           num_beams=3, max_seq_len=64)
        assert out.sequences == want.sequences
        assert out.num_generated == [len(want.sequences[0]) - 4]
