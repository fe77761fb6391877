"""Slope-timed breakdown of one paged decode step at 7B geometry.

decode_bench (honest) says 20.4 ms per 8 layers @bs16 ctx1024, but the
weight linears only cost ~2.4 ms (probe_decode_r4 chain4). This isolates
the other step components at the exact shapes forward_paged runs them:
  - paged_write (k,v scatter into the pool, int8 quant)
  - paged_decode_attention kernel
  - rmsnorm + rope + sampling glue
Each timed as (T_hi - T_lo)/(I_hi - I_lo) with stacked anti-hoist state
where needed.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

B, HQ, HKV, D = 16, 32, 32, 128
BS = 128
CTX = 1024
MB = CTX // BS + 1
NB = B * MB + 1


def slope(run_builder, args, lo=64, hi=256):
    run_lo, run_hi = run_builder(lo), run_builder(hi)
    float(run_lo(*args)); float(run_hi(*args))
    t_lo = min(_t(run_lo, args) for _ in range(2))
    t_hi = min(_t(run_hi, args) for _ in range(2))
    return (t_hi - t_lo) / (hi - lo)


def _t(run, args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    kp = jax.random.randint(key, (NB, HKV, BS, D), -127, 128, jnp.int8)
    vp = jax.random.randint(jax.random.fold_in(key, 1),
                            (NB, HKV, BS, D), -127, 128, jnp.int8)
    ks = jnp.abs(jax.random.normal(key, (NB, HKV, BS), jnp.float32)) * 0.01
    table = jnp.asarray(
        np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))
    lens = jnp.full((B,), CTX, jnp.int32)
    q = jax.random.normal(key, (B, HQ, D), jnp.bfloat16)

    # ---- decode attention kernel ----
    def attn_run(n):
        @jax.jit
        def run(q, kp, vp, ks):
            def body(i, carry):
                q, acc = carry
                out = paged_decode_attention(q, kp, vp, ks, ks, table, lens,
                                             scale=0.088)
                q = jax.lax.dynamic_update_slice(
                    q, (out[:1, :1, :1] * 1e-20).astype(q.dtype), (0, 0, 0))
                return (q, acc + out[0, 0, 0].astype(jnp.float32))
            _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
            return acc
        return run

    t = slope(attn_run, (q, kp, vp, ks))
    kv_bytes = B * CTX * HKV * D * 2 + B * CTX * HKV * 4 * 2
    print(f"decode_attn int8: {t*1e6:8.1f} us/layer-step "
          f"{kv_bytes/t/1e9:6.1f} GB/s", flush=True)

    # ---- paged_write ----
    new_k = jax.random.normal(key, (B, 1, HKV, D), jnp.bfloat16)
    caches = {"k": kp, "v": vp, "k_scale": ks, "v_scale": ks}

    def write_run(n):
        @jax.jit
        def run(caches, new_k):
            def body(i, carry):
                caches, acc = carry
                wp = (lens[:, None] + 0 * i).astype(jnp.int32)
                out = pkv.paged_write(caches, table, wp, new_k, new_k,
                                      quantized=True)
                nk = jax.lax.dynamic_update_slice(
                    new_k, (out["k"][:1, :1, :1, :1] * 0).astype(new_k.dtype),
                    (0, 0, 0, 0))
                return (out, acc + out["k"][0, 0, 0, 0].astype(jnp.float32))
            out, acc = jax.lax.fori_loop(0, n, body, (caches, jnp.float32(0)))
            return acc
        return run

    t = slope(write_run, (caches, new_k))
    print(f"paged_write int8: {t*1e6:8.1f} us/layer-step", flush=True)

    # ---- full forward_paged step (2 layers, scaled) ----
    from mixq_tensorrt_llm_tpu.models import (ModelConfig, llama as mllama,
                                              common as mcommon)
    from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                             KVCacheQuantAlgo)
    from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv
    nl = 2
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=nl,
                      num_heads=32, num_kv_heads=32, head_dim=128,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=128,
                                        kv_cache=KVCacheQuantAlgo.INT8))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    state = init_paged_kv(cfg, NB, BS)
    tok0 = jnp.ones((B, 1), jnp.int32)

    def fwd_run(n):
        @jax.jit
        def run(params, tokens, state, lens):
            def body(i, carry):
                tokens, state, lens, acc = carry
                pos = lens[:, None].astype(jnp.int32)
                logits, state = mcommon.forward_paged(
                    params, cfg, tokens, pos, state, table, lens + 1)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt[:, None], state, lens + 1, acc + logits[0, 0, 0])
            out = jax.lax.fori_loop(0, n, body,
                                    (tokens, state, lens, jnp.float32(0)))
            return out[3]
        return run

    t = slope(fwd_run, (params, tok0, state, lens), lo=16, hi=64)
    print(f"forward_paged 2-layer step: {t*1e6:8.1f} us "
          f"({t*1e6/nl:.1f} us/layer incl. embed+head)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
