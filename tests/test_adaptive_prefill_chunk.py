"""Adaptive prefill chunks (r2 VERDICT missing #4): the executor's chunked
prefill sizes each call to the smallest page-aligned pow2-of-block_size
chunk covering the lanes' remaining prompt, instead of always running the
full (P, prefill_chunk) rectangle — the static-shape analogue of the
reference's remove_input_padding token packing. Outputs must be identical
to the fixed-chunk executor."""

import jax
import numpy as np

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models.families import init_random_params
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

CFG = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
           num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
           max_position_embeddings=128)


def test_adaptive_chunk_outputs_equal_small_chunk():
    cfg = ModelConfig(**CFG)
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    # mixed prompt lengths incl. far-below-chunk ones
    prompts = [[3, 1, 4], [2] * 20, [7, 8], [9] * 33]

    def run(prefill_chunk):
        ex = Executor(params, cfg, max_batch=4, max_seq_len=64,
                      block_size=8, prefill_chunk=prefill_chunk, seed=0)
        ids = [ex.submit(p, max_new_tokens=5) for p in prompts]
        done = ex.run()
        return [done[r].generated for r in ids]

    assert run(32) == run(8)


def test_adaptive_chunk_sizes_shrink(monkeypatch):
    """Short prompts actually run smaller programs: spy on the prefill fn's
    token width."""
    cfg = ModelConfig(**CFG)
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    ex = Executor(params, cfg, max_batch=2, max_seq_len=64,
                  block_size=8, prefill_chunk=32, seed=0)
    widths = []
    orig = ex._prefill

    def spy(params, tokens, *a, **kw):
        widths.append(tokens.shape[1])
        return orig(params, tokens, *a, **kw)

    ex._prefill = spy
    ex.submit([5, 6, 7], max_new_tokens=2)         # 3 tokens -> 8-chunk
    ex.run()
    ex.submit(list(range(1, 30)), max_new_tokens=2)  # 29 tokens -> 32-chunk
    ex.run()
    assert widths[0] == 8 and widths[-1] == 32, widths


def test_adaptive_lane_count():
    """The lane axis adapts too: a single prefilling request runs a
    (1, chunk) program, three run a pow2-padded (4, chunk); outputs equal
    the fixed-lane executor's."""
    cfg = ModelConfig(**CFG)
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    prompts = [[3, 1, 4, 1, 5], [2] * 12, [7] * 9]

    lane_counts = []

    def run(n_prompts, spy=False):
        ex = Executor(params, cfg, max_batch=4, max_seq_len=64,
                      block_size=8, prefill_chunk=16, prefill_lanes=4,
                      seed=0)
        if spy:
            orig = ex._prefill

            def wrapped(params, tokens, *a, **kw):
                lane_counts.append(tokens.shape[0])
                return orig(params, tokens, *a, **kw)

            ex._prefill = wrapped
        ids = [ex.submit(p, max_new_tokens=4) for p in prompts[:n_prompts]]
        done = ex.run()
        return [done[r].generated for r in ids]

    one = run(1, spy=True)
    assert lane_counts and set(lane_counts) == {1}, lane_counts
    lane_counts.clear()
    three = run(3, spy=True)
    assert lane_counts and set(lane_counts) == {4}, lane_counts
    assert run(1) == one and run(3) == three  # deterministic
    # parity vs a wider-both-axes executor (different program shapes)
    ex = Executor(params, cfg, max_batch=4, max_seq_len=64,
                  block_size=8, prefill_chunk=32, prefill_lanes=4, seed=0)
    ids = [ex.submit(p, max_new_tokens=4) for p in prompts]
    done = ex.run()
    assert [done[r].generated for r in ids] == three
