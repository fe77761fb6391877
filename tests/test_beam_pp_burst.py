"""Beam BURSTS under pp / pp x tp meshes (r4 VERDICT missing #5).

Round 4's pp beams ran one stage-pipelined forward per token — the
dispatch regime runtime/pp_burst.py was built to kill for plain decode.
runtime/beam_pp.py runs k_eff beam steps in ONE compiled call on the
circular microbatch schedule: request groups round-robin over stage
ranks, the in-graph top-k reorder rides the same lax.ppermute ring as the
activations (each rank applies group g's step-s parents exactly at its
own (g, s+1) tick), the final step's reorder psum-broadcasts once, and
the COW + tail-flush epilogue commits each rank's own layers' pages.
These tests pin token/score equality against the single-device burst —
plain, quantized KV + kernel plane, controls, eos, COW-inducing ragged
prompts, pp x tp composition — and the fallback for b % pp != 0.
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models.families import init_random_params
from mixq_tensorrt_llm_tpu.quant.config import (QuantConfig, QuantAlgo,
                                                KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime.beam import paged_beam_search
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

import jax.numpy as jnp

# f32 model: the pp stage bodies run gl-row matmuls where the flat burst
# runs N-row ones — identical math, but bf16 rounding under different XLA
# tilings drifts ~1e-4 and (worse) lets exact logit TIES break either
# way. f32 keeps the equality assertions meaningful (same convention as
# tests/test_pp_executor.py).
BASE = dict(vocab_size=96, hidden_size=64, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position_embeddings=128, dtype=jnp.float32)

# 4 requests: pp=2 groups of 2; ragged lens force boundary COW
PROMPTS = [[3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1], [11, 12, 13, 14, 15],
           [8, 8]]


def _model(quant):
    q = (QuantConfig() if quant == "none" else
         QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8,
                     kv_cache=KVCacheQuantAlgo.INT8))
    cfg = ModelConfig(**BASE, quant=q)
    return cfg, init_random_params(cfg, jax.random.PRNGKey(0))


def _mesh(pp, tp=1):
    return Mesh(np.array(jax.devices()[:pp * tp]).reshape(pp, tp),
                ("pp", "tp"))


@pytest.mark.parametrize("quant", ["none", "int8kv_mix"])
@pytest.mark.parametrize("burst", [4, 8])
def test_pp_burst_equals_flat_burst(quant, burst, monkeypatch):
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg, params = _model(quant)
    kw = dict(num_beams=3, max_seq_len=64, block_size=8, burst=burst)
    ref = paged_beam_search(params, cfg, PROMPTS, 10, **kw)
    got = paged_beam_search(params, cfg, PROMPTS, 10, mesh=_mesh(pp=2),
                            **kw)
    assert got.sequences == ref.sequences
    np.testing.assert_allclose(got.scores, ref.scores, rtol=2e-5,
                               atol=2e-5)


def test_pp_tp_burst_equals_flat(monkeypatch):
    """pp=2 x tp=2: stage-sharded tails with the nested head-shard
    stats kernels inside each stage body."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg, params = _model("int8kv_mix")
    kw = dict(num_beams=2, max_seq_len=64, block_size=8, burst=4)
    ref = paged_beam_search(params, cfg, PROMPTS, 8, **kw)
    got = paged_beam_search(params, cfg, PROMPTS, 8,
                            mesh=_mesh(pp=2, tp=2), **kw)
    assert got.sequences == ref.sequences
    np.testing.assert_allclose(got.scores, ref.scores, rtol=2e-5,
                               atol=2e-5)


def test_pp_burst_eos_and_controls(monkeypatch):
    """eos early-stop + min_new_tokens + stop_sequences ride the pp
    burst's in-graph controls identically to the flat burst."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg, params = _model("none")
    kw = dict(num_beams=3, max_seq_len=64, block_size=8, burst=4,
              eos_token_id=5, min_new_tokens=[3, None, 2, 1],
              stop_sequences=[[[9]], None, [[12, 13]], None])
    ref = paged_beam_search(params, cfg, PROMPTS, 12, **kw)
    got = paged_beam_search(params, cfg, PROMPTS, 12, mesh=_mesh(pp=2),
                            **kw)
    assert got.sequences == ref.sequences
    np.testing.assert_allclose(got.scores, ref.scores, rtol=2e-5,
                               atol=2e-5)


def test_pp4_burst_equals_flat(monkeypatch):
    """pp=4 (ll=1, 4 request groups of one): the deepest ring — this
    geometry also exposed the pre-existing forward_paged_pp pp>2 write
    bug the per-step plane had (see test_pp_executor.py pp4 note)."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg = ModelConfig(**dict(BASE, num_layers=4), quant=QuantConfig(
        algo=QuantAlgo.INT8_MIX, num_outliers=8,
        kv_cache=KVCacheQuantAlgo.INT8))
    params = init_random_params(cfg, jax.random.PRNGKey(1))
    kw = dict(num_beams=3, max_seq_len=64, block_size=8, burst=4)
    ref = paged_beam_search(params, cfg, PROMPTS, 12, **kw)
    got = paged_beam_search(params, cfg, PROMPTS, 12, mesh=_mesh(pp=4),
                            **kw)
    assert got.sequences == ref.sequences
    np.testing.assert_allclose(got.scores, ref.scores, rtol=2e-5,
                               atol=2e-5)


def test_pp_burst_fallback_odd_batch():
    """b % pp != 0 falls back to the per-step pp plane (still exact)."""
    cfg, params = _model("none")
    kw = dict(num_beams=2, max_seq_len=64, block_size=8)
    ref = paged_beam_search(params, cfg, PROMPTS[:3], 6, **kw)
    got = paged_beam_search(params, cfg, PROMPTS[:3], 6, burst=4,
                            mesh=_mesh(pp=2), **kw)
    assert got.sequences == ref.sequences


def test_executor_run_beams_pp_burst(monkeypatch):
    """Executor.run_beams on a pp mesh drives the burst program end to
    end (matches the single-device executor's beams)."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    cfg, params = _model("int8kv_mix")

    def run(mesh):
        ex = Executor(params, cfg, seed=0, mesh=mesh, max_batch=4,
                      max_seq_len=64, block_size=8, prefill_chunk=8)
        ids = [ex.submit(p, max_new_tokens=8) for p in PROMPTS]
        done = ex.run_beams(num_beams=2, burst=4)
        return [done[r].generated for r in ids]

    want = run(None)
    assert run(_mesh(pp=2)) == want
