"""Paged KV cache + continuous-batching executor tests.

Gold standard: the dense-cache GenerationSession. The paged executor must
produce identical greedy tokens, across chunked prefill, ragged admission,
and pool-pressure scenarios.
"""

import jax
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                         KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime import (BlockManager, Executor,
                                           GenerationSession, SamplingConfig)


def tiny_cfg(**kw):
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                max_position_embeddings=256)
    base.update(kw)
    return ModelConfig(**base)


class TestBlockManager:
    def test_alloc_free_cycle(self):
        bm = BlockManager(num_blocks=9, block_size=4)
        assert bm.num_free == 8   # block 0 reserved as trash
        sb = bm.add_sequence(0, 10)       # needs 3 blocks
        assert len(sb.blocks) == 3 and bm.num_free == 5
        assert 0 not in sb.blocks
        bm.extend(0, 3)                    # 13 tokens -> 4 blocks
        assert len(bm.seqs[0].blocks) == 4
        bm.free_sequence(0)
        assert bm.num_free == 8

    def test_exhaustion_raises(self):
        bm = BlockManager(num_blocks=3, block_size=4)
        bm.add_sequence(0, 8)
        with pytest.raises(RuntimeError, match="exhausted"):
            bm.add_sequence(1, 4)

    def test_fork_shares_refcounted(self):
        bm = BlockManager(num_blocks=9, block_size=4)
        bm.add_sequence(0, 8)
        bm.fork(0, 1)
        assert bm.seqs[0].blocks == bm.seqs[1].blocks
        bm.free_sequence(0)
        assert bm.num_free == 6    # still held by seq 1
        bm.free_sequence(1)
        assert bm.num_free == 8

    def test_sliding_window_recycles(self):
        bm = BlockManager(num_blocks=9, block_size=4, sink_blocks=1,
                          window_blocks=2)
        bm.add_sequence(0, 12)     # 3 blocks: 1 sink + 2 window
        first_window_block = bm.seqs[0].blocks[1]
        bm.extend(0, 4)            # beyond window -> recycle, no new alloc
        assert len(bm.seqs[0].blocks) == 3
        assert bm.seqs[0].blocks[-1] == first_window_block


@pytest.fixture(scope="module")
def quantized_model():
    cfg = tiny_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=4,
                                     kv_cache=KVCacheQuantAlgo.INT8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    return params, cfg


class TestExecutor:
    def test_matches_dense_session_greedy(self, quantized_model):
        # use_flash_prefill=False keeps the dense prefill arithmetic
        # identical to the paged path (same masked attend over the cache),
        # so greedy tokens must match exactly even at logit near-ties
        params, cfg = quantized_model
        session = GenerationSession(params, cfg, max_seq_len=64,
                                    prefill_buckets=(16,),
                                    use_flash_prefill=False)
        prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [100, 101, 102, 103]]
        want = session.generate(prompts, max_new_tokens=6).sequences

        ex = Executor(params, cfg, max_batch=4, max_seq_len=64,
                      block_size=8, prefill_chunk=16)
        ids = [ex.submit(p, max_new_tokens=6) for p in prompts]
        done = ex.run()
        got = [done[i].sequence for i in ids]
        assert got == want

    def test_chunked_prefill_matches_single_shot(self, quantized_model):
        params, cfg = quantized_model
        prompt = list(range(1, 41))   # 40 tokens, chunk=16 -> 3 chunks
        ex1 = Executor(params, cfg, max_batch=2, max_seq_len=64,
                       block_size=8, prefill_chunk=16)
        ex2 = Executor(params, cfg, max_batch=2, max_seq_len=64,
                       block_size=8, prefill_chunk=64)
        a = ex1.run() if not ex1.submit(prompt, 5) else ex1.run()
        b = ex2.run() if not ex2.submit(prompt, 5) else ex2.run()
        assert a[0].sequence == b[0].sequence

    def test_continuous_admission_under_slot_pressure(self, quantized_model):
        """More requests than slots: later requests join as earlier finish,
        results must match isolated runs."""
        params, cfg = quantized_model
        session = GenerationSession(params, cfg, max_seq_len=64,
                                    prefill_buckets=(16,),
                                    use_flash_prefill=False)
        prompts = [[i + 1, i + 2, i + 3] for i in range(0, 50, 10)]  # 5 reqs
        want = [session.generate([p], max_new_tokens=4).sequences[0]
                for p in prompts]

        ex = Executor(params, cfg, max_batch=2, max_seq_len=64,
                      block_size=8, prefill_chunk=16)
        ids = [ex.submit(p, max_new_tokens=4) for p in prompts]
        done = ex.run()
        got = [done[i].sequence for i in ids]
        assert got == want

    def test_eos_finishes_early(self, quantized_model):
        params, cfg = quantized_model
        ex = Executor(params, cfg, max_batch=2, max_seq_len=64,
                      block_size=8, prefill_chunk=16)
        rid = ex.submit([1, 2, 3], max_new_tokens=8)
        done = ex.run()
        first = done[rid].generated[0]
        ex2 = Executor(params, cfg, max_batch=2, max_seq_len=64,
                       block_size=8, prefill_chunk=16)
        rid2 = ex2.submit([1, 2, 3], max_new_tokens=8, eos_token_id=first)
        done2 = ex2.run()
        assert done2[rid2].generated == [first]

    def test_timing_fields_populated(self, quantized_model):
        params, cfg = quantized_model
        ex = Executor(params, cfg, max_batch=2, max_seq_len=64,
                      block_size=8, prefill_chunk=16)
        rid = ex.submit([1, 2, 3], max_new_tokens=3)
        done = ex.run()
        r = done[rid]
        assert r.first_token_time is not None
        assert r.finish_time >= r.first_token_time >= r.submit_time


class TestCancel:
    def test_cancel_queued_and_active(self, quantized_model):
        params, cfg = quantized_model
        ex = Executor(params, cfg, max_batch=1, max_seq_len=64,
                      block_size=8, prefill_chunk=16)
        a = ex.submit([1, 2, 3], max_new_tokens=20)
        b = ex.submit([4, 5, 6], max_new_tokens=20)   # queued (1 slot)
        ex.step()   # admits a, generates
        assert ex.cancel(b)          # cancel while queued
        assert ex.cancel(a)          # cancel while in flight
        done = ex.run()
        assert done[b].generated == []
        assert 1 <= len(done[a].generated) < 20
        assert not ex.cancel(a)      # already finished
        # pool fully released
        assert ex.bm.num_free == ex.bm.num_blocks - 1


class TestBurstDecode:
    def _mk(self, cfg, params, **kw):
        from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
        return Executor(params, cfg, max_batch=4, max_seq_len=64,
                        block_size=8, prefill_chunk=8, seed=0, **kw)

    def test_burst_matches_single_step_greedy(self, quantized_model):
        params, cfg = quantized_model
        prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 5, 5, 5, 5]]

        ex1 = self._mk(cfg, params)
        r1 = [ex1.submit(p, max_new_tokens=10) for p in prompts]
        out1 = ex1.run()

        ex2 = self._mk(cfg, params)
        r2 = [ex2.submit(p, max_new_tokens=10) for p in prompts]
        out2 = ex2.run(burst=4)

        for a, b in zip(r1, r2):
            assert out1[a].generated == out2[b].generated, \
                (out1[a].generated, out2[b].generated)

    def test_burst_respects_eos_and_max(self, quantized_model):
        params, cfg = quantized_model
        ex = self._mk(cfg, params)
        rid = ex.submit([1, 2, 3], max_new_tokens=9)
        base = ex.run()[rid].generated
        eos = base[4]

        ex2 = self._mk(cfg, params)
        rid2 = ex2.submit([1, 2, 3], max_new_tokens=9, eos_token_id=eos)
        got = ex2.run(burst=4)[rid2].generated
        assert got[-1] == eos and eos not in got[:-1]
        assert len(got) <= 9

    def test_burst_with_min_new_tokens(self, quantized_model):
        params, cfg = quantized_model
        ex = self._mk(cfg, params)
        rid = ex.submit([1, 2, 3], max_new_tokens=9)
        base = ex.run()[rid].generated
        eos = base[1]   # would stop at step 2 without the floor

        ex2 = self._mk(cfg, params)
        rid2 = ex2.submit([1, 2, 3], max_new_tokens=9, eos_token_id=eos,
                          min_new_tokens=5)
        got = ex2.run(burst=3)[rid2].generated
        assert len(got) >= 5
        assert eos not in got[:4]


def test_mesh_sharded_executor_matches_single():
    """Serving over a (dp=1, pp=1, tp=2) mesh: weights column/row-sharded,
    paged pools sharded on the KV-head axis, GSPMD partitioning the step
    programs — greedy outputs must equal the unsharded executor's."""
    from jax.sharding import Mesh
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    kw = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8)
    prompts = [[3, 1, 4, 1], [2, 7]]

    plain = Executor(params, cfg, seed=0, **kw)
    ids = [plain.submit(p, max_new_tokens=6) for p in prompts]
    want = [plain.run()[r].generated for r in ids]

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 1, 2),
                ("dp", "pp", "tp"))
    ex = Executor(params, cfg, seed=0, mesh=mesh, **kw)
    ids2 = [ex.submit(p, max_new_tokens=6) for p in prompts]
    done = ex.run()
    for r, w in zip(ids2, want):
        assert done[r].generated == w, (done[r].generated, w)


def test_priority_admission_order():
    """Higher-priority requests admit first when slots free up (reference
    Request.priority); equal priorities stay FIFO."""
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    ex = Executor(params, cfg, max_batch=1, max_seq_len=64, block_size=8,
                  prefill_chunk=8, prefill_lanes=1, seed=0)
    low = ex.submit([1, 2, 3], max_new_tokens=2, priority=0.2)
    mid = ex.submit([4, 5], max_new_tokens=2)
    high = ex.submit([6, 7], max_new_tokens=2, priority=0.9)
    done = ex.run()
    order = sorted(done, key=lambda r: done[r].finish_time)
    assert order == [high, mid, low]


def test_iteration_stats():
    """Per-step telemetry (reference IterationStats): counts, kv usage,
    step time recorded every step()."""
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    ex = Executor(params, cfg, max_batch=2, max_seq_len=64, block_size=8,
                  prefill_chunk=8, seed=0)
    ex.submit([1, 2, 3], max_new_tokens=5)
    ex.submit([4, 5], max_new_tokens=3)
    ex.run()
    stats = ex.get_latest_iteration_stats(100)
    assert len(stats) >= 4
    assert sum(s.tokens_produced for s in stats) == 8
    assert all(s.step_time_s > 0 for s in stats)
    assert 0.0 <= stats[0].kv_cache_usage <= 1.0
    assert stats[0].num_active + stats[0].num_prefilling >= 1


def test_max_queue_size_backpressure(quantized_model):
    """submit() raises QueueFullError at capacity and accepts again once
    the queue drains (reference ExecutorConfig.max_queue_size)."""
    import pytest as _pytest
    from mixq_tensorrt_llm_tpu.runtime.scheduler import QueueFullError
    params, cfg = quantized_model
    ex = Executor(params, cfg, max_batch=2, max_seq_len=32, block_size=8,
                  max_queue_size=2)
    ex.submit([1, 2], max_new_tokens=2)
    ex.submit([3, 4], max_new_tokens=2)
    with _pytest.raises(QueueFullError):
        ex.submit([5, 6], max_new_tokens=2)
    ex.run()
    rid = ex.submit([5, 6], max_new_tokens=2)     # drained: accepted
    assert len(ex.run()[rid].generated) == 2


def test_warmup_compiles_and_discards(quantized_model):
    """warmup() leaves no residue and later requests behave identically
    to a cold executor's."""
    params, cfg = quantized_model
    kw = dict(max_batch=2, max_seq_len=32, block_size=8, prefill_chunk=8)
    ex = Executor(params, cfg, seed=0, **kw)
    ex.warmup(burst=2)
    assert not ex.finished and ex.num_active == 0
    assert ex.bm.num_free == ex.bm.num_blocks - 1    # all pages returned
    rid = ex.submit([1, 2, 3], max_new_tokens=5)
    got = ex.run()[rid].generated

    cold = Executor(params, cfg, seed=0, **kw)
    r2 = cold.submit([1, 2, 3], max_new_tokens=5)
    assert cold.run()[r2].generated == got


def test_kv_cache_stats(quantized_model):
    """get_kv_cache_stats mirrors reference KvCacheStats accounting."""
    params, cfg = quantized_model
    ex = Executor(params, cfg, max_batch=2, max_seq_len=32, block_size=8,
                  num_blocks=16)
    s0 = ex.get_kv_cache_stats()
    assert s0 == {"max_num_blocks": 15, "free_num_blocks": 15,
                  "used_num_blocks": 0, "cached_num_blocks": 0,
                  "tokens_per_block": 8}
    rid = ex.submit([1] * 9, max_new_tokens=3)   # 2 blocks + growth
    ex.step()
    mid = ex.get_kv_cache_stats()
    assert mid["used_num_blocks"] > 0
    assert mid["used_num_blocks"] + mid["free_num_blocks"] == 15
    ex.run()
    assert ex.get_kv_cache_stats() == s0         # all pages returned


def test_warmup_under_queue_backpressure(quantized_model):
    """warmup()'s multi-request lane passes must not trip max_queue_size
    (admission backpressure is for client traffic, not warm dummies)."""
    params, cfg = quantized_model
    ex = Executor(params, cfg, max_batch=4, max_seq_len=32, block_size=8,
                  prefill_chunk=8, prefill_lanes=4, max_queue_size=2)
    ex.warmup(burst=4)
    assert ex.max_queue_size == 2       # restored afterwards
    assert not ex.finished and ex.num_active == 0


def test_gen1_wave_does_not_false_stall(quantized_model):
    """A prefill wave whose requests finish on their first token
    (max_new_tokens=1) counts as progress: more queued requests than
    prefill lanes must not raise the stall error."""
    params, cfg = quantized_model
    ex = Executor(params, cfg, max_batch=4, max_seq_len=32, block_size=8,
                  prefill_chunk=8, prefill_lanes=2, seed=0)
    rids = [ex.submit([1 + i, 2, 3], max_new_tokens=1) for i in range(6)]
    done = ex.run()
    assert all(len(done[r].generated) == 1 for r in rids)


def test_nonpow2_prefill_lanes(quantized_model):
    """prefill_lanes=3: the lane axis still runs (outputs equal the
    lanes=4 executor) and warmup covers the full-lane program."""
    params, cfg = quantized_model
    prompts = [[3, 1, 4], [2] * 9, [7] * 5]

    def run(lanes):
        ex = Executor(params, cfg, max_batch=4, max_seq_len=32,
                      block_size=8, prefill_chunk=8, prefill_lanes=lanes,
                      seed=0)
        ex.warmup(burst=2)
        ids = [ex.submit(p, max_new_tokens=4) for p in prompts]
        done = ex.run(burst=2)
        return [done[r].generated for r in ids]

    assert run(3) == run(4)
