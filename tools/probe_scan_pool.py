"""Hypothesis probe: does threading each layer's KV pool through lax.scan
xs->ys force whole-pool copies (~140 MB/layer) in the decode step?

Compares at 7B geometry (bs16, ctx1024, int8_mix + int8 KV, 2 layers):
  scan     : forward_paged as shipped (pools as scan xs/ys)
  unrolled : identical math, Python-unrolled layers, per-layer pool dicts
             carried through the step fori_loop (XLA in-place dus)

Slope-timed (RTT cancels; see docs/PERF.md).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.models import (ModelConfig, llama as mllama,
                                          common as mcommon)
from mixq_tensorrt_llm_tpu.ops import ref as ops_ref, dispatch
from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                         KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv

B, BS, CTX = 16, 128, 1024
MB = CTX // BS + 3
NB = B * MB + 1
NL = 2

cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                  intermediate_size=11008, num_layers=NL,
                  num_heads=32, num_kv_heads=32, head_dim=128,
                  quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                    num_outliers=128,
                                    kv_cache=KVCacheQuantAlgo.INT8))


def slope(build, args, lo=16, hi=64):
    fl, fh = build(lo), build(hi)
    float(fl(*args)); float(fh(*args))
    t_lo = min(_t(fl, args) for _ in range(2))
    t_hi = min(_t(fh, args) for _ in range(2))
    return (t_hi - t_lo) / (hi - lo)


def _t(run, args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def main():
    print("devices:", jax.devices(), flush=True)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    state = init_paged_kv(cfg, NB, BS)
    table = jnp.asarray(
        np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))
    tok0 = jnp.ones((B, 1), jnp.int32)
    lens0 = jnp.full((B,), CTX, jnp.int32)

    # ---- shipped scan path ----
    def scan_run(n):
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

    t = slope(scan_run, (params, tok0, state, lens0))
    print(f"scan     : {t*1e6:8.1f} us/step ({t*1e6/NL:.1f}/layer)",
          flush=True)

    # ---- unrolled per-layer pools ----
    # per-layer cache dicts (split from the stacked state) and per-layer
    # param trees, all passed as jit ARGS (closure capture would bake them
    # in as compile-request constants -> HTTP 413)
    layer_params = [jax.tree.map(lambda a: a[i], params["layers"])
                    for i in range(NL)]
    caches0 = [{"k": state.k[i], "v": state.v[i],
                "k_scale": state.k_scale[i], "v_scale": state.v_scale[i]}
               for i in range(NL)]

    def unrolled_step(params, lp, tokens, caches, lens):
        pos = lens[:, None].astype(jnp.int32)
        x = jnp.take(params["embed"]["w"], tokens, axis=0).astype(cfg.dtype)
        sin, cos = mcommon.rope_sin_cos(pos, cfg.head_dim, cfg.rope_theta)
        new_caches = []
        for i in range(NL):
            x, nc = mcommon.decoder_layer(cfg, lp[i], x, sin, cos,
                                          caches[i], pos, lens + 1,
                                          block_table=table)
            new_caches.append(nc)
        x = ops_ref.rmsnorm(x, params["final_norm"]["w"], cfg.rms_norm_eps)
        logits = dispatch.linear(params["lm_head"], x,
                                 cfg.module_algo("lm_head"))
        return logits.astype(jnp.float32), new_caches

    def unrolled_run(n):
        @jax.jit
        def run(params, lp, tokens, caches, lens):
            def body(i, carry):
                tokens, caches, lens, acc = carry
                logits, caches = unrolled_step(params, lp, tokens, caches,
                                               lens)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt[:, None], caches, lens + 1, acc + logits[0, 0, 0])
            out = jax.lax.fori_loop(0, n, body,
                                    (tokens, caches, lens, jnp.float32(0)))
            return out[3]
        return run

    t = slope(unrolled_run, (params, layer_params, tok0, caches0, lens0))
    print(f"unrolled : {t*1e6:8.1f} us/step ({t*1e6/NL:.1f}/layer)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
