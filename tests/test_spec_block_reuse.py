"""In-flight speculative decoding combined with KV block reuse.

The two features interact at the block manager: speculative rounds
rewind rejected tail pages while prefix caching holds extra refcounts on
prompt blocks (reference: executor enableBlockReuse + the KVCacheUpdater
rewind path, tensorrt_llm/runtime/kv_cache_manager.py:380-464). These
tests pin that (a) a cached-prefix re-run under run_speculative is
bit-identical to a cold plain run, and (b) rewind never frees or leaks a
cache-owned block — full conservation accounting after completion.
"""

import jax
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, max_position_embeddings=128)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = ModelConfig(vocab_size=128, hidden_size=64,
                            intermediate_size=128, num_layers=1,
                            num_heads=4, num_kv_heads=2, head_dim=16,
                            max_position_embeddings=128)
    draft_params = mllama.init_random_params(draft_cfg, jax.random.PRNGKey(5))
    return params, cfg, draft_params, draft_cfg


KW = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8,
          num_blocks=24)


@pytest.mark.parametrize("plen", [11, 16])   # partial tail / exact blocks
def test_cached_prefix_rerun_matches_plain(setup, plen):
    """Second run of the same prompt adopts cached blocks; speculative
    decode on adopted pages must reproduce the cold plain-run output
    (prompts sized so adoption covers a partial tail and an exact
    block-multiple — the latter starts generation on a fresh block
    directly after shared ones)."""
    params, cfg, draft_params, draft_cfg = setup
    prompt = [(i * 7 + 3) % 100 for i in range(plen)]
    n = 9

    plain = Executor(params, cfg, seed=0, **KW)
    rid = plain.submit(prompt, max_new_tokens=n)
    want = plain.run()[rid].generated

    ex = Executor(params, cfg, seed=0, enable_block_reuse=True, **KW)
    a = ex.submit(prompt, max_new_tokens=n)
    got_a = ex.run_speculative(draft_params, draft_cfg, gamma=3)[a].generated
    assert got_a == want
    assert ex.bm.prefix_cache_size >= plen // KW["block_size"]

    b = ex.submit(prompt, max_new_tokens=n)
    got_b = ex.run_speculative(draft_params, draft_cfg, gamma=3)[b].generated
    assert got_b == want


def test_rewind_conserves_cache_owned_blocks(setup):
    """After all requests finish, every block is either free or owned
    exactly once by the prefix cache — rewinds of rejected draft tails
    must not free cache-owned prompt blocks nor leak exclusive ones."""
    params, cfg, draft_params, draft_cfg = setup
    ex = Executor(params, cfg, seed=0, enable_block_reuse=True, **KW)
    # two lanes, shared prefix between them, enough tokens to force
    # several speculative rounds with rejections (distinct draft model)
    base = [(i * 5 + 1) % 100 for i in range(16)]
    ids = [ex.submit(base, max_new_tokens=10),
           ex.submit(base[:8] + [77, 78], max_new_tokens=12)]
    done = ex.run_speculative(draft_params, draft_cfg, gamma=3)
    assert all(done[r].done for r in ids)

    cached = ex.bm.prefix_cache_size
    assert cached > 0
    # conservation: block 0 is the reserved trash block
    assert ex.bm.num_free + cached == KW["num_blocks"] - 1
