"""Memory analysis of the beam-burst program at the serving shapes that
OOM'd on chip (16 req x 4 beams, 7B full depth): lower + compile the burst
fn and print XLA's memory breakdown."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig, KVCacheQuantAlgo
from mixq_tensorrt_llm_tpu.runtime import beam as rbeam
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

cfg = ModelConfig(vocab_size=32000, hidden_size=4096, intermediate_size=11008,
                  num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
                  quant=QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=128,
                                    kv_cache=KVCacheQuantAlgo.INT8))
b, k, k_eff, bs = 16, 4, 16, 128
max_prompt, gen = 512, 64
cow_margin = 0 if max_prompt % bs == 0 else 1
per_lane = (-(-(max_prompt + gen + 1) // bs) - max_prompt // bs + cow_margin)
nb = 1 + b * (-(-max_prompt // bs)) + b * k * per_lane
mb = -(-(max_prompt + gen + 1) // bs)
print(f"pool blocks {nb}, mb {mb}, per_lane {per_lane}")
params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
state = pkv.init_paged_kv(cfg, nb, bs)
pools = {"k": state.k, "v": state.v, "k_scale": state.k_scale,
         "v_scale": state.v_scale}
n = b * k
table = jnp.zeros((n, mb), jnp.int32)
bpos = jnp.zeros((n, mb), jnp.int32)
cur = jnp.ones((n,), jnp.int32)
plen = jnp.full((n,), max_prompt, jnp.int32)
scores = jnp.zeros((b, k), jnp.float32)
fin = jnp.zeros((b, k), bool)
fn = rbeam._make_beam_burst(params, cfg, b, k, k_eff, -1, True,
                            do_cow=True, quantized=True)
cow_src = jnp.zeros((n,), jnp.int32)
cow_dst = jnp.zeros((n,), jnp.int32)
flush_blk = jnp.zeros((n, k_eff), jnp.int32)
flush_off = jnp.zeros((n, k_eff), jnp.int32)
t0 = time.time()
lowered = fn.lower(params, pools, table, bpos, cur, plen, scores, fin,
                   cow_src, cow_dst, flush_blk, flush_off, None,
                   jnp.int32(1), None, None)
comp = lowered.compile()
ma = comp.memory_analysis()
print(f"compiled in {time.time()-t0:.0f}s")
print(ma)
