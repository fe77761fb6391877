"""Every quantization scheme through the serving stack.

One parametrized matrix: for each QuantAlgo (and KV cache dtype where it
applies), the paged continuous-batching executor must reproduce the dense
GenerationSession greedy output bit-for-bit. Catches any scheme that a
new dispatch/kernel/cache change silently breaks.
"""

import jax
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import (KVCacheQuantAlgo, QuantAlgo,
                                         QuantConfig)
from mixq_tensorrt_llm_tpu.runtime import GenerationSession
from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

SCHEMES = [
    ("none", QuantConfig()),
    ("w8a16", QuantConfig(algo=QuantAlgo.W8A16)),
    ("w4a16", QuantConfig(algo=QuantAlgo.W4A16)),
    ("w4a16_g", QuantConfig(algo=QuantAlgo.W4A16_G, group_size=32)),
    ("fp8", QuantConfig(algo=QuantAlgo.FP8)),
    ("int8_lr", QuantConfig(algo=QuantAlgo.INT8_LR)),
    ("int8_mix", QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=4)),
    ("int8_mix_kv8", QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=4,
                                 kv_cache=KVCacheQuantAlgo.INT8)),
    ("int4_mix", QuantConfig(algo=QuantAlgo.INT4_MIX, num_outliers=4)),
    ("none_kvfp8", QuantConfig(kv_cache=KVCacheQuantAlgo.FP8)),
]


@pytest.mark.parametrize("name,quant", SCHEMES,
                         ids=[n for n, _ in SCHEMES])
def test_executor_matches_session(name, quant):
    cfg = ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=16, max_position_embeddings=64, quant=quant)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))

    sess = GenerationSession(params, cfg, max_seq_len=32,
                             prefill_buckets=(8,), use_flash_prefill=False)
    want = sess.generate([[1, 2, 3], [4, 5]], 6).sequences

    ex = Executor(params, cfg, max_batch=2, max_seq_len=32, block_size=8,
                  prefill_chunk=8, seed=0)
    ids = [ex.submit(p, max_new_tokens=6) for p in ([1, 2, 3], [4, 5])]
    done = ex.run()
    for rid, prompt, w in zip(ids, ([1, 2, 3], [4, 5]), want):
        assert prompt + done[rid].generated == w, (name, rid)
