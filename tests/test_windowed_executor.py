"""StreamingLLM sink+window serving over the paged executor (VERDICT r1
item 9: finish the paged sliding-window/sink semantics)."""

import jax
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=512)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(2))
    return params, cfg


def test_windowed_generation_bounded_blocks(setup):
    """Long generation under sink+window recycles pages in place: the
    per-sequence block count stays capped while positions keep advancing."""
    params, cfg = setup
    ex = Executor(params, cfg, max_batch=1, max_seq_len=256, block_size=8,
                  prefill_chunk=8, sink_blocks=1, window_blocks=3,
                  num_blocks=8, seed=0)   # pool smaller than 80 tokens!
    rid = ex.submit([1, 2, 3, 4, 5], max_new_tokens=70)
    done = ex.run()
    assert len(done[rid].generated) == 70
    # pool of 7 usable blocks never exhausted despite 75 positions: QED
    # recycling worked; and the manager holds at most sink+window blocks
    assert ex.bm.num_free >= 3


def test_windowed_matches_across_managers(setup):
    """Native C++ and Python managers produce identical windowed decode."""
    params, cfg = setup
    outs = []
    for native in ("1", "0"):
        import os
        os.environ["MIXQ_NATIVE"] = native
        try:
            ex = Executor(params, cfg, max_batch=2, max_seq_len=256,
                          block_size=8, prefill_chunk=8, sink_blocks=1,
                          window_blocks=2, seed=0)
            a = ex.submit(list(range(1, 20)), max_new_tokens=24)
            b = ex.submit([7, 8, 9], max_new_tokens=24)
            done = ex.run()
            outs.append((done[a].generated, done[b].generated))
        finally:
            os.environ.pop("MIXQ_NATIVE", None)
    assert outs[0] == outs[1]


def test_window_changes_output_vs_full_attention(setup):
    """The recycled window genuinely restricts attention: a long sequence
    generates differently with and without the window (sanity that the
    masks are live), while a short one (inside the window) is identical."""
    params, cfg = setup

    def gen(window_blocks, n_prompt, n_new):
        ex = Executor(params, cfg, max_batch=1, max_seq_len=256,
                      block_size=8, prefill_chunk=8, sink_blocks=1,
                      window_blocks=window_blocks, seed=0)
        rid = ex.submit(list(np.arange(1, n_prompt + 1) % 90),
                        max_new_tokens=n_new)
        return ex.run()[rid].generated

    # short sequence: fits entirely in sink+window -> identical output
    assert gen(None, 6, 4) == gen(4, 6, 4)
    # long sequence: the window must bite eventually
    assert gen(None, 40, 30) != gen(2, 40, 30)


def test_windowed_prefill_long_prompt(setup):
    """A prompt longer than the window prefills correctly (recycling during
    decode after a full-prompt prefill) and generation stays deterministic."""
    params, cfg = setup
    runs = []
    for _ in range(2):
        ex = Executor(params, cfg, max_batch=1, max_seq_len=256,
                      block_size=8, prefill_chunk=16, sink_blocks=1,
                      window_blocks=3, seed=3)
        rid = ex.submit(list(np.arange(1, 45) % 90), max_new_tokens=20)
        runs.append(ex.run()[rid].generated)
    assert runs[0] == runs[1]
    assert len(runs[0]) == 20
