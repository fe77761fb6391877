"""Decode-regime routing: S <= 4 steps run the weight-only path on the
full qweight, exactly like the reference's SMALL_M_FAST_PATH == 4 GEMV
(weightonlykernel/fpA_intB_gemm_wrapper.h:3; plugin prefill/decode split
TsinghuaMixQPlugin.cpp:472,624). The exact threshold also keeps a
gamma <= 3 speculative verify numerically identical to the draft's decode
steps (round-3 on-chip finding: an S==1-only rule made the verify run mix
math against a weight-only draft, collapsing acceptance to chance)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tensorrt_llm_tpu.models import (ModelConfig, forward,
                                          init_kv_cache, llama as mllama)
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig


def test_decode_step_equals_w8a16_model():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))

    # strip the outlier tensors -> a pure W8A16 model with the same qweights
    cfg_wo = dataclasses.replace(
        cfg, quant=QuantConfig(algo=QuantAlgo.W8A16))
    params_wo = jax.tree.map(lambda x: x, params)
    for mod in ("qkv_proj", "o_proj", "gate_up_proj"):
        params_wo["layers"][mod] = {
            k: v for k, v in params["layers"][mod].items()
            if k in ("qweight", "scale_col", "b")}

    b = 1
    tokens = jnp.array([[5, 6, 7]], jnp.int32)
    pos = jnp.arange(3)[None]
    lens = jnp.array([3], jnp.int32)

    # identical prefill state: run prefill with the SAME (mix) model twice
    cache_a = init_kv_cache(cfg, b, 8)
    _, cache_a = forward(params, cfg, tokens, pos, cache_a, lens)
    cache_b = init_kv_cache(cfg, b, 8)
    _, cache_b = forward(params, cfg, tokens, pos, cache_b, lens)

    step_tok = jnp.array([[9]], jnp.int32)
    step_pos = jnp.array([[3]], jnp.int32)
    la, _ = forward(params, cfg, step_tok, step_pos, cache_a,
                    jnp.array([4], jnp.int32))
    lb, _ = forward(params_wo, cfg_wo, step_tok, step_pos, cache_b,
                    jnp.array([4], jnp.int32))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_prefill_still_uses_mixed_path():
    """S>4 must keep the outlier side-GEMM: zeroing fp_weight changes
    prefill logits but must NOT change a decode step (S<=4 routes
    weight-only, the reference SMALL_M_FAST_PATH boundary)."""
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(1))
    params_z = jax.tree.map(lambda x: x, params)
    for mod in ("qkv_proj", "o_proj", "gate_up_proj"):
        t = dict(params_z["layers"][mod])
        t["fp_weight"] = jnp.zeros_like(t["fp_weight"])
        params_z["layers"][mod] = t

    tokens = jnp.array([[5, 6, 7, 8, 9]], jnp.int32)   # S=5 > fast path
    pos = jnp.arange(5)[None]
    lens = jnp.array([5], jnp.int32)
    la, ca = forward(params, cfg, tokens, pos, init_kv_cache(cfg, 1, 16),
                     lens)
    lb, cb = forward(params_z, cfg, tokens, pos, init_kv_cache(cfg, 1, 16),
                     lens)
    assert not np.array_equal(np.asarray(la), np.asarray(lb))

    # S = 4 == SMALL_M_FAST_PATH: weight-only, outliers must NOT matter
    t4 = jnp.array([[5, 6, 7, 8]], jnp.int32)
    p4 = jnp.arange(4)[None]
    l4 = jnp.array([4], jnp.int32)
    f4a, _ = forward(params, cfg, t4, p4, init_kv_cache(cfg, 1, 16), l4)
    f4b, _ = forward(params_z, cfg, t4, p4, init_kv_cache(cfg, 1, 16), l4)
    np.testing.assert_array_equal(np.asarray(f4a), np.asarray(f4b))

    step = jnp.array([[9]], jnp.int32)
    spos = jnp.array([[5]], jnp.int32)
    da, _ = forward(params, cfg, step, spos, ca, jnp.array([6], jnp.int32))
    # caches differ (prefill differed) so compare only the routing effect:
    # rerun decode from the SAME cache
    db2, _ = forward(params_z, cfg, step, spos, ca,
                     jnp.array([6], jnp.int32))
    np.testing.assert_array_equal(np.asarray(da), np.asarray(db2))
