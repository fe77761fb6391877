"""Data-parallel SERVING through the Executor (r4 VERDICT missing #3).

The reference gets serving DP for free — one engine process per GPU is
batch replication (SURVEY §2.5). Rounds 2-4 paid a 4-8x cliff instead:
any 'dp' mesh dropped to the pool-materializing jnp plane. These tests
pin the kernel-plane design: lanes, tables, lens and the GROUP-major
page pool shard on 'dp' through forward_paged_dp's manual shard_map
(models/common.py), each lane group an unchanged single-chip executor
slice with its own block manager (scheduler._GroupedBM), ZERO
collectives in the step, and outputs token-exact with the single-device
executor — for plain dp, dp x tp (nested head-shard kernels), and under
KV-pressure preemption inside a group.
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models.families import init_random_params
from mixq_tensorrt_llm_tpu.quant.config import (QuantConfig, QuantAlgo,
                                                KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

BASE = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
            max_position_embeddings=128)

PROMPTS = [[3, 1, 4, 1, 5, 9, 2, 6, 5], [2, 7, 19, 23, 29],
           [11, 12, 13, 14], [8, 8, 1], [5, 4, 3, 2, 1, 0, 1, 2], [42]]
BUDGETS = [6, 5, 6, 4, 6, 5]


def _mesh(dp, tp=1):
    n = dp * tp
    return Mesh(np.array(jax.devices()[:n]).reshape(dp, tp), ("dp", "tp"))


def _cfg(quant):
    q = (QuantConfig() if quant == "none" else
         QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8,
                     kv_cache=KVCacheQuantAlgo.INT8))
    return ModelConfig(**BASE, quant=q)


def _run(cfg, params, mesh, burst=4, **kw):
    ex = Executor(params, cfg, seed=0, mesh=mesh, max_batch=4,
                  max_seq_len=64, block_size=8, prefill_chunk=8, **kw)
    ids = [ex.submit(p, max_new_tokens=b)
           for p, b in zip(PROMPTS, BUDGETS)]
    done = ex.run(burst=burst)
    return [done[r].generated for r in ids], ex


@pytest.mark.parametrize("quant", ["none", "int8kv_mix"])
def test_dp2_kernel_executor_matches_single(quant, monkeypatch):
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = _cfg(quant)
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    want, _ = _run(cfg, params, None)

    pkv.GATHER_TRACES[0] = 0
    got, ex = _run(cfg, params, _mesh(dp=2))
    assert ex._use_kernels, "dp lanes must run the kernel plane"
    assert got == want, (got, want)
    assert pkv.GATHER_TRACES[0] == 0, \
        "dp serving traced the pool-materializing paged_gather"


def test_dp2_tp2_kernel_executor_matches_single(monkeypatch):
    """dp x tp: lane groups over 'dp', head shards over 'tp' inside each
    group (the nested shard_map via kernel_shard._resolve_mesh, same
    mechanism as pp x tp)."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = _cfg("int8kv_mix")
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    want, _ = _run(cfg, params, None)

    pkv.GATHER_TRACES[0] = 0
    got, ex = _run(cfg, params, _mesh(dp=2, tp=2))
    assert ex._use_kernels
    assert got == want, (got, want)
    assert pkv.GATHER_TRACES[0] == 0


def test_dp_preemption_within_group(monkeypatch):
    """A tight per-group pool forces KV-pressure preemption INSIDE a lane
    group (victims must come from the starved group — their pages are
    group-local); replays stitch exactly, outputs equal the single-device
    run with the same per-group budget."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = _cfg("int8kv_mix")
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    # 2 groups x 6 blocks = 5 usable per group: two 24-token sequences
    # per group need 2x3 pages > 5, so each group preempts one mid-decode
    long_prompts = [[i + 1] * 12 for i in range(4)]
    want_ex = Executor(params, cfg, seed=0, max_batch=4, max_seq_len=64,
                       block_size=8, prefill_chunk=8)
    ids = [want_ex.submit(p, max_new_tokens=12) for p in long_prompts]
    want = [want_ex.run()[r].generated for r in ids]

    ex = Executor(params, cfg, seed=0, mesh=_mesh(dp=2), max_batch=4,
                  max_seq_len=64, block_size=8, prefill_chunk=8,
                  num_blocks=12)   # 6 per group
    ids = [ex.submit(p, max_new_tokens=12) for p in long_prompts]
    done = ex.run()
    got = [done[r].generated for r in ids]
    assert got == want, (got, want)
    assert ex.preemptions > 0, "the tight pool should have preempted"


def test_dp_rejects_unsupported_modes():
    cfg = ModelConfig(**BASE, quant=QuantConfig(
        algo=QuantAlgo.INT8_MIX, num_outliers=8, dynamic_outliers=True))
    with pytest.raises(AssertionError, match="dynamic outliers"):
        Executor(init_random_params(cfg, jax.random.PRNGKey(0)), cfg,
                 max_batch=4, max_seq_len=64, block_size=8,
                 mesh=_mesh(dp=2))
    cfg2 = _cfg("int8kv_mix")
    ex = Executor(init_random_params(cfg2, jax.random.PRNGKey(0)), cfg2,
                  max_batch=4, max_seq_len=64, block_size=8,
                  prefill_chunk=8, mesh=_mesh(dp=2))
    ex.submit([1, 2, 3], max_new_tokens=4)
    with pytest.raises(AssertionError, match="beam search x dp"):
        ex.run_beams(num_beams=2)


def test_dp_grouped_stats_and_reuse(monkeypatch):
    """Grouped accounting: kv stats discount one trash block per group;
    prefix reuse (enableBlockReuse) adopts within a group."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = _cfg("int8kv_mix")
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    ex = Executor(params, cfg, seed=0, mesh=_mesh(dp=2), max_batch=4,
                  max_seq_len=64, block_size=8, prefill_chunk=8,
                  num_blocks=16, enable_block_reuse=True)
    st = ex.get_kv_cache_stats()
    assert st["max_num_blocks"] == 16 - 2      # one trash per group
    prompt = [7] * 16 + [3]
    r1 = ex.submit(prompt, max_new_tokens=3)
    out1 = ex.run()[r1].generated
    # same prefix again: full blocks adopted from the group's cache
    r2 = ex.submit(prompt, max_new_tokens=3)
    out2 = ex.run()[r2].generated
    assert out1 == out2
    assert ex.get_kv_cache_stats()["cached_num_blocks"] > 0


def test_dp_windowed_matches_single(monkeypatch):
    """StreamingLLM sink+window serving under dp lane groups: each
    group's block manager recycles windowed pages independently;
    outputs equal the single-device windowed executor."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = _cfg("int8kv_mix")
    params = init_random_params(cfg, jax.random.PRNGKey(0))

    def run(mesh):
        ex = Executor(params, cfg, seed=0, mesh=mesh, max_batch=4,
                      max_seq_len=128, block_size=8, prefill_chunk=8,
                      sink_blocks=1, window_blocks=3)
        ids = [ex.submit(p, max_new_tokens=40) for p in PROMPTS[:4]]
        done = ex.run(burst=8)
        return [done[r].generated for r in ids]

    want = run(None)
    pkv.GATHER_TRACES[0] = 0
    got = run(_mesh(dp=2))
    assert got == want, (got, want)
    assert pkv.GATHER_TRACES[0] == 0
