"""FP8 quantization (stock TRT-LLM algo): weight-only fp8 and fp8 KV.

Weights store float8_e4m3 with per-out-channel scales (absmax/448),
dequantized into the dot; KV caches store e4m3 with the same
per-(token, head) scale scheme as int8 KV. Pallas kernels stay int8-only;
fp8 paths ride the XLA-partitionable jnp math.
"""


import jax
import jax.numpy as jnp
import numpy as np

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import (KVCacheQuantAlgo, QuantAlgo,
                                         QuantConfig)
from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.ops import dispatch
from mixq_tensorrt_llm_tpu.runtime import GenerationSession
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor


def tiny(quant=QuantConfig()):
    return ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       head_dim=16, max_position_embeddings=128,
                       quant=quant)


def test_fp8_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    q, s = qcore.quantize_weight_fp8(w)
    assert q.dtype == jnp.float8_e4m3fn
    deq = q.astype(jnp.float32) * s[None, :]
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.05


def test_fp8_linear_close_to_float():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (64, 48)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64))
    params = dispatch.quantize_linear_params(w, QuantAlgo.FP8)
    got = dispatch.linear(params, x, QuantAlgo.FP8)
    want = x @ w
    rel = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert rel < 0.08


def test_fp8_weights_generate_close_to_float():
    cfg_f = tiny()
    params_hf = mllama.init_random_params(cfg_f, jax.random.PRNGKey(0))
    base = GenerationSession(params_hf, cfg_f, max_seq_len=48,
                             prefill_buckets=(8,)).generate(
        [[1, 2, 3]], 8).sequences[0]

    from mixq_tensorrt_llm_tpu.convert.from_float import requantize
    pq, cfg_q = requantize(params_hf, cfg_f,
                           QuantConfig(algo=QuantAlgo.FP8))
    got = GenerationSession(pq, cfg_q, max_seq_len=48,
                            prefill_buckets=(8,)).generate(
        [[1, 2, 3]], 8).sequences[0]
    # fp8 is near-lossless at these magnitudes: prefixes must agree
    assert got[:6] == base[:6], (got, base)


def test_fp8_kv_session_decode_consistency():
    cfg = tiny(QuantConfig(algo=QuantAlgo.W8A16,
                           kv_cache=KVCacheQuantAlgo.FP8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    sess = GenerationSession(params, cfg, max_seq_len=48,
                             prefill_buckets=(8,), use_flash_prefill=False)
    out = sess.generate([[1, 2, 3], [4, 5]], 8)
    assert [len(s) for s in out.sequences] == [11, 10]

    # fp8 KV stays close to the bf16-KV outputs
    cfg_n = tiny(QuantConfig(algo=QuantAlgo.W8A16))
    pn = mllama.init_random_params(cfg_n, jax.random.PRNGKey(0))
    want = GenerationSession(pn, cfg_n, max_seq_len=48,
                             prefill_buckets=(8,),
                             use_flash_prefill=False).generate(
        [[1, 2, 3], [4, 5]], 8)
    assert out.sequences[0][:6] == want.sequences[0][:6]


def test_fp8_kv_paged_executor_matches_session():
    cfg = tiny(QuantConfig(algo=QuantAlgo.W8A16,
                           kv_cache=KVCacheQuantAlgo.FP8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    sess = GenerationSession(params, cfg, max_seq_len=48,
                             prefill_buckets=(8,), use_flash_prefill=False)
    want = sess.generate([[3, 1, 4]], 8).sequences[0][3:]

    ex = Executor(params, cfg, max_batch=1, max_seq_len=48, block_size=8,
                  prefill_chunk=8)
    rid = ex.submit([3, 1, 4], max_new_tokens=8)
    got = ex.run()[rid].generated
    # independent quantization points; allow an argmax flip after a while
    assert got[:5] == want[:5], (got, want)


def test_fp8_checkpoint_roundtrip(tmp_path):
    from mixq_tensorrt_llm_tpu.convert.checkpoint import (load_checkpoint,
                                                          save_checkpoint)
    cfg = tiny(QuantConfig(algo=QuantAlgo.FP8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), params, cfg)
    p2, cfg2 = load_checkpoint(str(tmp_path))
    assert cfg2.quant.algo == QuantAlgo.FP8
    assert p2["layers"]["qkv_proj"]["qweight"].dtype == jnp.float8_e4m3fn
