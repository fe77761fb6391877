"""KV-pressure preemption + budgeted pool sizing (r2 VERDICT weak #5 /
next-round item 6).

The pool can now be sized to a KV-token BUDGET (max_kv_tokens) instead of
the max_batch x max_seq_len worst case; when decode lanes outgrow it, the
lowest-priority request is preempted — pages freed, committed tokens
replayed through chunked prefill on re-admission via the snapshot/restore
stitching — so oversubscription degrades to queueing, never to OOM or
wrong output. Reference analogue: the C++ executor pauses requests under
cache pressure and reuses their blocks (executor.pyi SchedulerConfig).
"""

import jax
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models.families import init_random_params
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

CFG = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
           num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
           max_position_embeddings=128)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(**CFG)
    return init_random_params(cfg, jax.random.PRNGKey(0)), cfg


def _mk(params, cfg, **kw):
    base = dict(max_batch=2, max_seq_len=64, block_size=8, prefill_chunk=8,
                seed=0)
    base.update(kw)
    return Executor(params, cfg, **base)


def test_max_kv_tokens_sizes_pool(model):
    params, cfg = model
    ex = _mk(params, cfg, max_kv_tokens=40)
    assert ex.bm.num_blocks == 40 // 8 + 1   # + trash block


def test_preemption_outputs_equal_big_pool(model):
    """A pool too small for both requests' full horizons: one gets
    preempted and replayed; greedy outputs must equal the unpressured
    run, and the preemption must actually have happened."""
    params, cfg = model
    prompts = [list(range(1, 11)), list(range(20, 30))]

    big = _mk(params, cfg)
    ids = [big.submit(p, max_new_tokens=20, priority=pr)
           for p, pr in zip(prompts, (0.9, 0.1))]
    want = [big.run()[r].generated for r in ids]
    assert big.preemptions == 0

    small = _mk(params, cfg, max_kv_tokens=40)   # 5 usable blocks
    ids2 = [small.submit(p, max_new_tokens=20, priority=pr)
            for p, pr in zip(prompts, (0.9, 0.1))]
    done = small.run()
    assert small.preemptions > 0
    got = [done[r].generated for r in ids2]
    assert got == want, (got, want)
    # the LOW-priority request was the victim: the high-priority one
    # finished first
    assert (done[ids2[0]].finish_time < done[ids2[1]].finish_time)
    # request surface looks uninterrupted (resume unstitched)
    assert done[ids2[1]].prompt == prompts[1]
    assert len(done[ids2[1]].generated) == 20
    assert len(done[ids2[1]].logprobs) == 20


def test_preemption_under_burst(model):
    params, cfg = model
    prompts = [list(range(1, 11)), list(range(20, 30))]
    big = _mk(params, cfg)
    ids = [big.submit(p, max_new_tokens=20) for p in prompts]
    want = [big.run(burst=4)[r].generated for r in ids]

    small = _mk(params, cfg, max_kv_tokens=40)
    ids2 = [small.submit(p, max_new_tokens=20) for p in prompts]
    done = small.run(burst=4)
    got = [done[r].generated for r in ids2]
    assert got == want, (got, want)
    assert small.preemptions > 0


def test_single_request_too_big_raises(model):
    params, cfg = model
    ex = _mk(params, cfg, max_kv_tokens=16)   # 2 usable blocks
    ex.submit(list(range(1, 11)), max_new_tokens=20)   # needs 4 blocks
    with pytest.raises(RuntimeError, match="KV pool exhausted|stalled"):
        ex.run()


def test_adaptive_burst_tail(model):
    """run(burst=8) with a 5-token budget must not loop forever and must
    match single-step outputs (pow2 tail: 4, then steps)."""
    params, cfg = model
    a = _mk(params, cfg)
    r1 = a.submit([1, 2, 3], max_new_tokens=5)
    want = a.run()[r1].generated
    b = _mk(params, cfg)
    r2 = b.submit([1, 2, 3], max_new_tokens=5)
    got = b.run(burst=8)[r2].generated
    assert got == want
