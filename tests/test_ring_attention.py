"""Ring attention over the 'sp' mesh axis vs single-device reference.

The reference reserves CP ranks but wires no CP attention (SURVEY §2.5);
parallel/context.py implements it. Parity oracle: ops_ref.attention with
the full causal mask on one device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.ops import ref as ops_ref
from mixq_tensorrt_llm_tpu.parallel.context import ring_attention
from mixq_tensorrt_llm_tpu.parallel.mapping import Mapping


def _mesh(sp):
    if jax.device_count() < sp:
        pytest.skip(f"needs {sp} devices")
    return Mapping(sp=sp).make_mesh()


@pytest.mark.parametrize("sp,hq,hkv", [(4, 4, 4), (8, 8, 2)])
def test_matches_reference(sp, hq, hkv):
    mesh = _mesh(sp)
    b, s, d = 2, 8 * sp, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, hkv, d), jnp.float32)

    mask = (jnp.arange(s)[None, None, None, :]
            <= jnp.arange(s)[None, None, :, None])
    want = ops_ref.attention(q, k, v, mask=mask)

    got = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_jit_under_mesh():
    mesh = _mesh(4)
    b, s, hq, d = 1, 32, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, s, hq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, hq, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, hq, d), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
    out = f(q, k, v)
    assert out.shape == (b, s, hq, d)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_sp_score_matches_single_device():
    """Full decoder scored with the sequence sharded over sp == the
    single-device forward (quantized model; GQA)."""
    from mixq_tensorrt_llm_tpu.models import (ModelConfig, init_kv_cache,
                                              forward, llama as mllama)
    from mixq_tensorrt_llm_tpu.parallel.context import sp_score
    from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig

    mesh = _mesh(4)
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    b, s = 2, 32
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0,
                                cfg.vocab_size, dtype=jnp.int32)

    cache = init_kv_cache(cfg, b, s)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    want, _ = forward(params, cfg, tokens, pos, cache,
                      jnp.full((b,), s, jnp.int32), full_prefill=True)

    got = sp_score(params, cfg, tokens, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
