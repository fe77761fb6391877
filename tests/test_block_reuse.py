"""KV block reuse / prefix caching (reference executor enableBlockReuse).

Full prompt blocks are content-addressed by a chain key (each block's key
commits to the entire prefix); a new request adopts matching cached
blocks and starts its chunked prefill AFTER them. Outputs must be
identical to the uncached run — adopted pages hold exactly the KV the
prompt would have written.
"""

import jax
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.runtime.kv_cache import BlockManager
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    return params, cfg


class TestManagerPrefixCache:
    def test_adopt_and_refcounts(self):
        bm = BlockManager(10, 4)
        toks = list(range(11))                       # 2 full blocks + tail
        bm.add_sequence(1, len(toks))
        bm.register_prefix(1, toks, upto=11)
        assert len(bm.prefix_cache) == 2
        sb, cached = bm.add_sequence_cached(2, toks + [42])
        assert cached == 8                           # adopted both blocks
        assert sb.blocks[:2] == bm.seqs[1].blocks[:2]
        # shared: seq1 + seq2 + cache = refcount 3
        assert bm.ref_counts[sb.blocks[0]] == 3
        bm.free_sequence(1)
        bm.free_sequence(2)
        assert bm.ref_counts[sb.blocks[0]] == 1      # cache still owns it

    def test_divergent_prefix_stops_adoption(self):
        bm = BlockManager(10, 4)
        toks = list(range(12))
        bm.add_sequence(1, 12)
        bm.register_prefix(1, toks, upto=12)
        other = toks[:4] + [99] + toks[5:]           # block 1 differs
        _, cached = bm.add_sequence_cached(2, other)
        assert cached == 4                           # only block 0 matches

    def test_eviction_frees_cached_blocks(self):
        bm = BlockManager(4, 4)                      # 3 usable blocks
        bm.add_sequence(1, 8)
        bm.register_prefix(1, list(range(8)), upto=8)
        bm.free_sequence(1)                          # cache owns 2 blocks
        assert len(bm.free) == 1
        bm.add_sequence(2, 12)                       # needs 3 -> evicts
        assert len(bm.seqs[2].blocks) == 3

    def test_full_block_prompt_keeps_one_uncached(self):
        bm = BlockManager(10, 4)
        toks = list(range(8))                        # exactly 2 blocks
        bm.add_sequence(1, 8)
        bm.register_prefix(1, toks, upto=8)
        _, cached = bm.add_sequence_cached(2, toks)
        assert cached == 4    # last block stays uncached -> logits emitted


def test_executor_reuse_identical_outputs(setup):
    """Identical prompt resubmitted: the second request adopts the cached
    blocks, skips those prefill chunks, and produces identical tokens."""
    params, cfg = setup
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8,
              num_blocks=24)
    prompt = list(np.arange(1, 21) % 50)             # 20 tokens = 2.5 blocks

    plain = Executor(params, cfg, seed=0, **kw)
    r = plain.submit(prompt, max_new_tokens=6)
    want = plain.run()[r].generated

    ex = Executor(params, cfg, seed=0, enable_block_reuse=True, **kw)
    a = ex.submit(prompt, max_new_tokens=6)
    first = ex.run()[a]
    assert first.generated == want

    b = ex.submit(prompt, max_new_tokens=6)
    # admission should adopt the two full prompt blocks
    ex._admit()
    req = ex.prefilling[0]
    assert req.prefill_pos == 16
    second = ex.run()[b]
    assert second.generated == want


def test_executor_reuse_shared_prefix_divergent_tail(setup):
    params, cfg = setup
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8,
              num_blocks=24)
    p1 = list(np.arange(1, 21) % 50)
    p2 = p1[:16] + [7, 9, 11]                        # shares 2 blocks

    plain = Executor(params, cfg, seed=0, **kw)
    r = plain.submit(p2, max_new_tokens=6)
    want = plain.run()[r].generated

    ex = Executor(params, cfg, seed=0, enable_block_reuse=True, **kw)
    ex.submit(p1, max_new_tokens=4)
    ex.run()
    b = ex.submit(p2, max_new_tokens=6)
    got = ex.run()[b].generated
    assert got == want


def test_native_manager_reuse_matches_python():
    from mixq_tensorrt_llm_tpu.runtime.native import (NativeBlockManager,
                                                      native_available)
    if not native_available():
        pytest.skip("no native toolchain")
    toks = list(range(11))
    py = BlockManager(10, 4)
    py.add_sequence(1, len(toks))
    py.register_prefix(1, toks, upto=11)
    _, py_cached = py.add_sequence_cached(2, toks + [42])

    nat = NativeBlockManager(10, 4)
    nat.add_sequence(1, len(toks))
    nat.register_prefix(1, toks, upto=11)
    _, nat_cached = nat.add_sequence_cached(2, toks + [42])
    assert nat_cached == py_cached == 8
    np.testing.assert_array_equal(py.block_table([2], 4),
                                  nat.block_table([2], 4))
    # divergent block stops adoption in both
    other = toks[:4] + [99] + toks[5:] + [1]
    _, pc = py.add_sequence_cached(3, other)
    _, nc = nat.add_sequence_cached(3, other)
    assert pc == nc == 4
