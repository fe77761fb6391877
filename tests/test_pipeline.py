"""Pipeline-parallel scoring forward vs the single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mixq_tensorrt_llm_tpu.models import (ModelConfig, forward,
                                          init_kv_cache, llama as mllama)
from mixq_tensorrt_llm_tpu.parallel import Mapping
from mixq_tensorrt_llm_tpu.parallel.pipeline import pipeline_score_logits
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig


def tiny_cfg(num_layers, **kw):
    base = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_layers=num_layers, num_heads=4, num_kv_heads=2,
                head_dim=16, max_position_embeddings=64)
    base.update(kw)
    return ModelConfig(**base)


def shard_for_pp(params, mesh):
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    out = {k: jax.tree.map(lambda x: put(x, P()), v)
           for k, v in params.items() if k != "layers"}
    out["layers"] = jax.tree.map(lambda x: put(x, P("pp")), params["layers"])
    return out


@pytest.mark.parametrize("quant", [
    QuantConfig(),
    QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=4),
])
def test_pipeline_matches_forward(quant):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mapping = Mapping(pp=4)
    mesh = mapping.make_mesh(jax.devices()[:4])

    cfg = tiny_cfg(num_layers=4, quant=quant)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))

    b, s, m = 4, 8, 2   # 4 sequences as 2 microbatches of 2
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.vocab_size)

    want, _ = forward(params, cfg, tokens,
                      jnp.tile(jnp.arange(s), (b, 1)),
                      init_kv_cache(cfg, b, s),
                      jnp.full((b,), s, jnp.int32))

    sharded = shard_for_pp(params, mesh)
    got = pipeline_score_logits(sharded, cfg, mesh, tokens,
                                num_microbatches=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)
    # greedy predictions identical
    assert (np.asarray(got).argmax(-1) == np.asarray(want).argmax(-1)).all()


def test_pipeline_microbatch_counts():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    mapping = Mapping(pp=2)
    mesh = mapping.make_mesh(jax.devices()[:2])
    cfg = tiny_cfg(num_layers=2)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(2))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (6, 8), 0, 128)
    sharded = shard_for_pp(params, mesh)

    want, _ = forward(params, cfg, tokens,
                      jnp.tile(jnp.arange(8), (6, 1)),
                      init_kv_cache(cfg, 6, 8),
                      jnp.full((6,), 8, jnp.int32))
    for m in (1, 2, 3, 6):
        got = pipeline_score_logits(sharded, cfg, mesh, tokens,
                                    num_microbatches=m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-2, atol=3e-2)
