"""In-flight speculative decoding on the continuous-batching executor.

Reference behavior being reproduced: the C++ executor accepts draft-model
proposals inside the serving loop and rewinds rejected KV pages
(KVCacheUpdater, tensorrt_llm/runtime/kv_cache_manager.py:380-464).
Here: greedy draft chain (one compiled scan) + one (gamma+1)-row paged
verify per round, BlockManager.rewind for the rejected tail.
"""

import jax
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.runtime.kv_cache import BlockManager
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor


def tiny_cfg(layers=2, seed=0):
    return ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_layers=layers, num_heads=4, num_kv_heads=2,
                       head_dim=16, max_position_embeddings=128)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = tiny_cfg(layers=1)
    draft_params = mllama.init_random_params(draft_cfg, jax.random.PRNGKey(5))
    return params, cfg, draft_params, draft_cfg


class TestRewind:
    def test_python_rewind_frees_tail_blocks(self):
        bm = BlockManager(10, 4)
        bm.add_sequence(0, 4)
        bm.extend(0, 8)                     # 12 tokens -> 3 blocks
        free_before = bm.num_free
        sb = bm.rewind(0, 5)                # back to 5 tokens -> 2 blocks
        assert sb.length == 5 and len(sb.blocks) == 2
        assert bm.num_free == free_before + 1

    def test_native_matches_python(self):
        from mixq_tensorrt_llm_tpu.runtime.native import (NativeBlockManager,
                                                          native_available)
        if not native_available():
            pytest.skip("no native toolchain")
        py, nat = BlockManager(10, 4), NativeBlockManager(10, 4)
        for bm in (py, nat):
            bm.add_sequence(7, 6)
            bm.extend(7, 7)
            bm.rewind(7, 6)
        assert py.num_free == nat.num_free
        np.testing.assert_array_equal(py.block_pos([7], 4),
                                      nat.block_pos([7], 4))
        assert nat.seq_length(7) == 6

    def test_rewind_keeps_partial_block(self):
        bm = BlockManager(10, 4)
        bm.add_sequence(0, 10)              # 3 blocks
        bm.rewind(0, 9)                     # position 8 still in block 2
        assert len(bm.seqs[0].blocks) == 3
        bm.rewind(0, 8)                     # block 2 now empty
        assert len(bm.seqs[0].blocks) == 2


def test_speculative_matches_plain_run(setup):
    """Greedy outputs are identical to Executor.run() for a mixed batch."""
    params, cfg, draft_params, draft_cfg = setup
    kw = dict(max_batch=3, max_seq_len=64, block_size=8, prefill_chunk=8)
    prompts = [[3, 1, 4], [2, 7], [5, 6, 7, 8]]

    plain = Executor(params, cfg, seed=0, **kw)
    ids = [plain.submit(p, max_new_tokens=n)
           for p, n in zip(prompts, (8, 5, 11))]
    want = {r: plain.run()[r].generated for r in ids}

    ex = Executor(params, cfg, seed=0, **kw)
    ids2 = [ex.submit(p, max_new_tokens=n)
            for p, n in zip(prompts, (8, 5, 11))]
    done = ex.run_speculative(draft_params, draft_cfg, gamma=3)
    for r, r2 in zip(ids, ids2):
        assert done[r2].generated == want[r], (r2, done[r2].generated)


def test_self_draft_accepts_everything(setup):
    """Draft == target: every proposal accepted, so each round commits
    gamma+1 tokens and the round count collapses."""
    params, cfg, _, _ = setup
    kw = dict(max_batch=1, max_seq_len=64, block_size=8, prefill_chunk=8)
    n = 12
    ex = Executor(params, cfg, seed=0, **kw)
    rid = ex.submit([3, 1, 4], max_new_tokens=n)
    done = ex.run_speculative(params, cfg, gamma=3)
    assert len(done[rid].generated) == n
    assert ex.spec_rounds <= -(-n // 4) + 1   # ~n/(gamma+1)

    plain = Executor(params, cfg, seed=0, **kw)
    rid2 = plain.submit([3, 1, 4], max_new_tokens=n)
    assert plain.run()[rid2].generated == done[rid].generated


def test_eos_mid_round(setup):
    """A lane that hits eos inside an accepted block stops exactly there
    and later rounds run it as a masked zombie."""
    params, cfg, draft_params, draft_cfg = setup
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8)
    probe = Executor(params, cfg, seed=0, **kw)
    rid = probe.submit([3, 1, 4], max_new_tokens=10)
    gen = probe.run()[rid].generated
    eos = gen[4]

    ex = Executor(params, cfg, seed=0, **kw)
    a = ex.submit([3, 1, 4], max_new_tokens=10, eos_token_id=eos)
    bq = ex.submit([2, 7], max_new_tokens=10)
    done = ex.run_speculative(draft_params, draft_cfg, gamma=3)
    assert done[a].generated == gen[:5]        # truncated at eos
    assert len(done[bq].generated) == 10       # batch-mate unaffected

    plain = Executor(params, cfg, seed=0, **kw)
    b2 = plain.submit([2, 7], max_new_tokens=10)
    assert plain.run()[b2].generated == done[bq].generated


def test_rejects_stochastic_and_windowed(setup):
    params, cfg, draft_params, draft_cfg = setup
    from mixq_tensorrt_llm_tpu.runtime.sampler import SamplingConfig
    ex = Executor(params, cfg, max_batch=1, max_seq_len=64, block_size=8,
                  prefill_chunk=8,
                  sampling=SamplingConfig(greedy=False, temperature=1.0))
    ex.submit([1, 2, 3], max_new_tokens=4)
    with pytest.raises(AssertionError, match="greedy"):
        ex.run_speculative(draft_params, draft_cfg, gamma=2)


def test_verify_kernel_path_matches_fallback(setup, monkeypatch):
    """Force the paged-kernel branch on CPU (interpret-mode Pallas): the
    small-q verify kernel must reproduce the gather-fallback outputs
    through the full run_speculative loop."""
    params, cfg, draft_params, draft_cfg = setup
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8)

    ex = Executor(params, cfg, seed=0, **kw)
    a = ex.submit([3, 1, 4], max_new_tokens=8)
    b = ex.submit([2, 7, 7], max_new_tokens=6)
    want = ex.run_speculative(draft_params, draft_cfg, gamma=3)
    want = {a: want[a].generated, b: want[b].generated}

    import mixq_tensorrt_llm_tpu.models.common as mcommon
    monkeypatch.setattr(mcommon, "_use_paged_kernel", lambda: True)
    # decode/prefill kernels also engage; block_size 8 < 128 is fine
    # un-quantized and in interpret mode
    ex2 = Executor(params, cfg, seed=0, **kw)
    a2 = ex2.submit([3, 1, 4], max_new_tokens=8)
    b2 = ex2.submit([2, 7, 7], max_new_tokens=6)
    done = ex2.run_speculative(draft_params, draft_cfg, gamma=3)
    assert done[a2].generated == want[a]
    assert done[b2].generated == want[b]


def test_speculative_on_tp_mesh(setup):
    """run_speculative over a tp=2 sharded executor matches the unsharded
    run (draft dense cache replicated, verify chunks GSPMD-partitioned)."""
    from jax.sharding import Mesh
    params, cfg, draft_params, draft_cfg = setup
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8)

    plain = Executor(params, cfg, seed=0, **kw)
    a = plain.submit([3, 1, 4], max_new_tokens=8)
    b = plain.submit([2, 7], max_new_tokens=6)
    want = {k: v.generated
            for k, v in plain.run_speculative(draft_params, draft_cfg,
                                              gamma=3).items()}

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 1, 2),
                ("dp", "pp", "tp"))
    ex = Executor(params, cfg, seed=0, mesh=mesh, **kw)
    a2 = ex.submit([3, 1, 4], max_new_tokens=8)
    b2 = ex.submit([2, 7], max_new_tokens=6)
    done = ex.run_speculative(draft_params, draft_cfg, gamma=3)
    assert done[a2].generated == want[a]
    assert done[b2].generated == want[b]


def test_spec_near_context_cap_finishes(setup):
    """Lanes within gamma tokens of max_seq_len fall back to plain steps
    instead of overflowing the per-sequence block budget."""
    params, cfg, draft_params, draft_cfg = setup
    kw = dict(max_batch=1, max_seq_len=24, block_size=8, prefill_chunk=8)
    plain = Executor(params, cfg, seed=0, **kw)
    r = plain.submit([3, 1, 4], max_new_tokens=21)   # 3 + 21 == cap
    want = plain.run()[r].generated

    ex = Executor(params, cfg, seed=0, **kw)
    a = ex.submit([3, 1, 4], max_new_tokens=21)
    done = ex.run_speculative(draft_params, draft_cfg, gamma=4)
    assert done[a].generated == want


def test_paged_draft_matches_dense_draft(setup):
    """paged_draft=True (default; own paged pool, shared block tables)
    produces the same outputs as the round-2 dense-cache draft path and
    as plain run()."""
    params, cfg, draft_params, draft_cfg = setup
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8)
    prompts = [[3, 1, 4, 1, 5], [2, 7]]

    def go(paged):
        ex = Executor(params, cfg, seed=0, **kw)
        ids = [ex.submit(p, max_new_tokens=9) for p in prompts]
        done = ex.run_speculative(draft_params, draft_cfg, gamma=3,
                                  paged_draft=paged)
        return [done[r].generated for r in ids]

    plain = Executor(params, cfg, seed=0, **kw)
    idsp = [plain.submit(p, max_new_tokens=9) for p in prompts]
    want = [plain.run()[r].generated for r in idsp]
    assert go(True) == want
    assert go(False) == want


def test_paged_int8_draft_self_acceptance(setup):
    """The r2 acceptance collapse came from the dense bf16 draft cache vs
    the int8 paged target (PERF.md spec row). With the paged int8 draft,
    a self-draft sees EXACTLY the target's cache numerics, so acceptance
    is total and rounds collapse to ~n/(gamma+1) — the ceiling the
    machinery is supposed to reach."""
    from mixq_tensorrt_llm_tpu.quant.config import (QuantConfig, QuantAlgo,
                                                    KVCacheQuantAlgo)
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=8,
                                        kv_cache=KVCacheQuantAlgo.INT8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    kw = dict(max_batch=1, max_seq_len=64, block_size=8, prefill_chunk=8)
    n = 12
    ex = Executor(params, cfg, seed=0, **kw)
    rid = ex.submit([3, 1, 4], max_new_tokens=n)
    done = ex.run_speculative(params, cfg, gamma=3, paged_draft=True)
    assert len(done[rid].generated) == n
    assert ex.spec_rounds <= -(-n // 4) + 1

    plain = Executor(params, cfg, seed=0, **kw)
    rid2 = plain.submit([3, 1, 4], max_new_tokens=n)
    assert plain.run()[rid2].generated == done[rid].generated
