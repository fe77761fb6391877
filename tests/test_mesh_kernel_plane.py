"""Multi-device KERNEL data plane: shard_map'd Pallas paged ops under a
'tp' mesh (r2 VERDICT missing #1 / next-round item 1).

Round 2 proved multi-chip serving CORRECT but on the jnp fallback — the
whole-pool-materializing paged_gather plus non-aliased scatter writes, the
exact patterns measured at 4-8x cost on one chip. These tests pin the new
plane: with MIXQ_PAGED_KERNEL=force on the 8-device CPU mesh (kernels in
interpret mode), a tp=2 Executor must

  (a) produce exactly the single-device executor's outputs,
  (b) never trace paged_gather in any step program, and
  (c) keep working with int8 KV, windows, and the Gemma-2 scale/softcap
      axes.

Reference analogue: the MixQ plugin + fused attention run unchanged per
rank with the NCCL allreduce around them (/root/reference/plugin.py:157-159
tp_group allreduce; tensorrt_llm/functional.py:3760).
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
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position_embeddings=128)

CONFIGS = {
    "plain": dict(BASE),
    "int8kv_mix": dict(BASE, quant=QuantConfig(
        algo=QuantAlgo.INT8_MIX, num_outliers=8,
        kv_cache=KVCacheQuantAlgo.INT8)),
    "softcap": dict(BASE, attn_scale=24 ** -0.5, attn_logit_softcap=5.0),
}


def _tp2_mesh():
    return Mesh(np.array(jax.devices()[:2]).reshape(2), ("tp",))


def _run(cfg, params, mesh, prompts, **kw):
    ex = Executor(params, cfg, seed=0, mesh=mesh, max_batch=2,
                  max_seq_len=64, block_size=8, prefill_chunk=8, **kw)
    ids = [ex.submit(p, max_new_tokens=6) for p in prompts]
    done = ex.run()
    return [done[r].generated for r in ids], ex


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_tp2_kernel_executor_matches_single(name, monkeypatch):
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = ModelConfig(**CONFIGS[name])
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    prompts = [[3, 1, 4, 1, 5, 9, 2, 6, 5, 3], [2, 7]]

    want, _ = _run(cfg, params, None, prompts)

    pkv.GATHER_TRACES[0] = 0
    got, ex = _run(cfg, params, _tp2_mesh(), prompts)
    assert ex._use_kernels and ex._kernel_mesh is not None
    assert got == want, (got, want)
    # (b): no (B, MB*BS, H, D) materializing gather in ANY mesh program
    assert pkv.GATHER_TRACES[0] == 0


def test_tp2_kernel_burst_and_windowed(monkeypatch):
    """Burst decode and a StreamingLLM window on the sharded kernel plane."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = ModelConfig(**CONFIGS["plain"])
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    prompts = [[3, 1, 4, 1, 5, 9], [2, 7, 1]]

    # burst path
    ex0 = Executor(params, cfg, seed=0, max_batch=2, max_seq_len=64,
                   block_size=8, prefill_chunk=8)
    ids0 = [ex0.submit(p, max_new_tokens=8) for p in prompts]
    ex0.run(burst=4)
    want = [ex0.finished[r].generated for r in ids0]

    ex = Executor(params, cfg, seed=0, mesh=_tp2_mesh(), max_batch=2,
                  max_seq_len=64, block_size=8, prefill_chunk=8)
    ids = [ex.submit(p, max_new_tokens=8) for p in prompts]
    ex.run(burst=4)
    assert [ex.finished[r].generated for r in ids] == want

    # windowed (sink+window block recycling) path
    kw = dict(sink_blocks=1, window_blocks=2)
    want_w, _ = _run(cfg, params, None, prompts, **kw)
    got_w, _ = _run(cfg, params, _tp2_mesh(), prompts, **kw)
    assert got_w == want_w


def test_unshardable_mesh_falls_back(monkeypatch):
    """tp not dividing num_kv_heads -> the jnp GSPMD plane, still correct."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    cfg = ModelConfig(**dict(BASE, num_heads=3, num_kv_heads=3))
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    prompts = [[5, 6, 7], [8]]
    want, _ = _run(cfg, params, None, prompts)
    got, ex = _run(cfg, params, _tp2_mesh(), prompts)
    assert not ex._use_kernels
    assert got == want
