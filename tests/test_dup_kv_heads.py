"""KV-head duplication for tp > num_kv_heads (r4 VERDICT missing #4).

GQA models with few KV heads used to fall off the kernel plane at high
tp (use_k required num_kv_heads % tp == 0). The reference instead
replicates KV heads up to tp_size at convert time — dup_kv_weight,
/root/reference/tensorrt_llm/models/llama/convert.py:544,1432-1435 — so
attention stays head-local on every rank. parallel/sharding.dup_kv_heads
is the shard-time analogue: these tests pin (a) the math (duplicated
params + kv'=tp produce bit-identical logits), (b) the Executor keeping
the kernel plane at tp=4 with kv=2 for quantized AND float layer
formats, and (c) flat qk-norm (OLMo-2) replicating with its heads.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models.common import forward, init_kv_cache
from mixq_tensorrt_llm_tpu.models.families import init_random_params
from mixq_tensorrt_llm_tpu.parallel.sharding import (dup_kv_heads,
                                                     maybe_dup_kv_heads)
from mixq_tensorrt_llm_tpu.quant.config import (QuantConfig, QuantAlgo,
                                                KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

BASE = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position_embeddings=128)


def _tp_mesh(tp):
    return Mesh(np.array(jax.devices()[:tp]), ("tp",))


def _fwd_logits(params, cfg, toks):
    b, s = toks.shape
    cache = init_kv_cache(cfg, b, 32)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    logits, _ = forward(params, cfg, toks, pos, cache,
                        jnp.full((b,), s, jnp.int32))
    return np.asarray(logits)


@pytest.mark.parametrize("quant,qk_flat", [
    ("none", False), ("int8_mix", False), ("none", True)])
def test_dup_kv_heads_exact(quant, qk_flat):
    """Duplicated params + cfg(num_kv_heads=tp) give bit-identical
    logits: q head h reads dup head h // (Hq/tp) whose content is the
    original head h // (Hq/kv)."""
    q = (QuantConfig() if quant == "none" else
         QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8))
    cfg = ModelConfig(**BASE, quant=q, qk_norm=qk_flat, qk_norm_flat=qk_flat)
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray([[3, 1, 4, 1, 5, 9], [2, 7, 1, 8, 2, 8]], jnp.int32)
    want = _fwd_logits(params, cfg, toks)

    params4, cfg4 = dup_kv_heads(params, cfg, tp=4)
    assert cfg4.num_kv_heads == 4
    got = _fwd_logits(params4, cfg4, toks)
    np.testing.assert_array_equal(got, want)


def test_maybe_dup_is_identity_when_divisible():
    cfg = ModelConfig(**BASE)      # kv=2
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    p2, c2 = maybe_dup_kv_heads(params, cfg, _tp_mesh(2))   # tp == kv
    assert c2.num_kv_heads == 2 and p2 is params


@pytest.mark.parametrize("quant", ["none", "int8kv_mix"])
def test_tp4_kv2_executor_kernel_plane(quant, monkeypatch):
    """tp=4 > kv=2 serves on the head-sharded kernel plane (used to be
    the documented jnp-fallback cliff), token-exact with single-device,
    zero pool gathers. 'none' exercises the float (w, b) tuple layers."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    q = (QuantConfig() if quant == "none" else
         QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8,
                     kv_cache=KVCacheQuantAlgo.INT8))
    cfg = ModelConfig(**BASE, quant=q)
    params = init_random_params(cfg, jax.random.PRNGKey(0))

    def run(mesh):
        ex = Executor(params, cfg, seed=0, mesh=mesh, max_batch=2,
                      max_seq_len=64, block_size=8, prefill_chunk=8)
        ids = [ex.submit(p, max_new_tokens=b) for p, b in
               [([3, 1, 4, 1, 5, 9, 2, 6, 5], 6), ([2, 7, 19, 23, 29], 5),
                ([11, 12, 13, 14], 6)]]
        done = ex.run(burst=4)
        return [done[r].generated for r in ids], ex

    want, _ = run(None)
    pkv.GATHER_TRACES[0] = 0
    got, ex = run(_tp_mesh(4))
    assert ex._use_kernels, "tp>kv must keep the kernel plane via dup"
    # pools sized to kv'=tp: head axis divides evenly across 4 shards
    assert ex.state.k.shape[1] == 4
    assert got == want, (got, want)
    assert pkv.GATHER_TRACES[0] == 0


def test_beams_tp4_kv2_kernel_plane(monkeypatch):
    """paged_beam_search applies dup_kv_heads itself: tp=4 > kv=2 beams
    stay on the stats-mode kernel plane and match single-device beams."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    monkeypatch.setenv("MIXQ_WRITE_KERNEL", "force")
    from mixq_tensorrt_llm_tpu.runtime.beam import paged_beam_search
    cfg = ModelConfig(**dict(BASE, dtype=jnp.float32),
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=8,
                                        kv_cache=KVCacheQuantAlgo.INT8))
    params = init_random_params(cfg, jax.random.PRNGKey(0))
    prompts = [[3, 1, 4, 1, 5, 9], [2, 7, 1], [11, 12, 13, 14]]
    kw = dict(num_beams=3, max_seq_len=64, block_size=8, burst=4)
    ref = paged_beam_search(params, cfg, prompts, 8, **kw)
    got = paged_beam_search(params, cfg, prompts, 8, mesh=_tp_mesh(4),
                            **kw)
    assert got.sequences == ref.sequences
    np.testing.assert_allclose(got.scores, ref.scores, rtol=2e-5,
                               atol=2e-5)
