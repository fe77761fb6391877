"""Native (C++) block manager: build, contract parity vs Python impl."""

import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.runtime.kv_cache import BlockManager
from mixq_tensorrt_llm_tpu.runtime.native import (NativeBlockManager,
                                                  native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def both(num_blocks=17, block_size=4, **kw):
    return (BlockManager(num_blocks, block_size, **kw),
            NativeBlockManager(num_blocks, block_size, **kw))


class TestParity:
    def test_alloc_extend_free_identical_tables(self):
        py, cc = both()
        for bm in (py, cc):
            bm.add_sequence(0, 10)
            bm.add_sequence(1, 3)
            bm.extend(0, 5)
            bm.free_sequence(1)
            bm.add_sequence(2, 7)
        assert py.num_free == cc.num_free
        # same allocation *order* policy -> identical tables
        np.testing.assert_array_equal(py.block_table([0, 2], 8),
                                      cc.block_table([0, 2], 8))

    def test_trash_block_reserved(self):
        _, cc = both()
        cc.add_sequence(0, 40)   # 10 blocks of a 16-free pool
        table = cc.block_table([0], 12)
        assert 0 not in table[0, :10]

    def test_exhaustion_and_recovery(self):
        _, cc = both(num_blocks=5, block_size=4)
        cc.add_sequence(0, 16)   # 4 blocks = whole usable pool
        with pytest.raises(RuntimeError, match="exhausted"):
            cc.add_sequence(1, 4)
        cc.free_sequence(0)
        cc.add_sequence(1, 4)
        assert cc.num_free == 3

    def test_fork_refcounts(self):
        py, cc = both()
        for bm in (py, cc):
            bm.add_sequence(0, 8)
            bm.fork(0, 1)
            bm.free_sequence(0)
        assert py.num_free == cc.num_free
        np.testing.assert_array_equal(py.block_table([1], 4),
                                      cc.block_table([1], 4))

    def test_sliding_window_recycle_parity(self):
        py, cc = both(sink_blocks=1, window_blocks=2)
        for bm in (py, cc):
            bm.add_sequence(0, 12)
            bm.extend(0, 4)
            bm.extend(0, 4)
        np.testing.assert_array_equal(py.block_table([0], 4),
                                      cc.block_table([0], 4))
        assert py.num_free == cc.num_free

    def test_seq_length_tracking(self):
        _, cc = both()
        cc.add_sequence(7, 9)
        cc.extend(7, 2)
        assert cc.seq_length(7) == 11

    def test_randomized_fuzz_parity(self):
        rng = np.random.default_rng(0)
        py, cc = both(num_blocks=33, block_size=4)
        live = []
        next_id = 0
        for _ in range(300):
            op = rng.integers(0, 3)
            if op == 0 and py.num_free > 4:
                n = int(rng.integers(1, 12))
                if py.can_allocate(n) and cc.can_allocate(n):
                    py.add_sequence(next_id, n)
                    cc.add_sequence(next_id, n)
                    live.append(next_id)
                    next_id += 1
            elif op == 1 and live:
                sid = live[int(rng.integers(0, len(live)))]
                ok_py = ok_cc = True
                try:
                    py.extend(sid, 1)
                except RuntimeError:
                    ok_py = False
                try:
                    cc.extend(sid, 1)
                except RuntimeError:
                    ok_cc = False
                assert ok_py == ok_cc
            elif op == 2 and live:
                sid = live.pop(int(rng.integers(0, len(live))))
                py.free_sequence(sid)
                cc.free_sequence(sid)
            assert py.num_free == cc.num_free
        if live:
            np.testing.assert_array_equal(py.block_table(live, 16),
                                          cc.block_table(live, 16))


class TestExecutorWithNative:
    def test_executor_native_matches_python(self):
        import jax
        from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
        from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
        from mixq_tensorrt_llm_tpu.runtime import Executor

        cfg = ModelConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=16,
                          quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                            num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        prompts = [[1, 2, 3], [5, 6, 7, 8]]

        import os
        os.environ["MIXQ_NATIVE"] = "0"
        ex_py = Executor(params, cfg, max_batch=2, max_seq_len=32,
                         block_size=8, prefill_chunk=16)
        os.environ["MIXQ_NATIVE"] = "1"
        ex_cc = Executor(params, cfg, max_batch=2, max_seq_len=32,
                         block_size=8, prefill_chunk=16)
        assert isinstance(ex_cc.bm, NativeBlockManager)
        ids_py = [ex_py.submit(p, 5) for p in prompts]
        ids_cc = [ex_cc.submit(p, 5) for p in prompts]
        done_py = ex_py.run()
        done_cc = ex_cc.run()
        assert [done_py[i].sequence for i in ids_py] == \
               [done_cc[i].sequence for i in ids_cc]
