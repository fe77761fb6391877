"""Bisect the UNROLLED 2-layer paged decode step (probe_scan_pool showed
1.81 ms/layer vs ~0.76 sum-of-parts). Monkeypatches mcommon._attention_paged
so the linears/norms/rope are exactly the shipped decoder_layer:

  full       : write + kernel (as shipped)
  no_write   : attention kernel reads the pool, write skipped
  no_kernel  : write runs, attention output faked from new_k
  scatter_wr : write via .at[blk,:,off].set scatter instead of the
               per-sequence dus fori_loop

Slope-timed; per-layer pool dicts passed as jit args (unrolled layers).
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
from mixq_tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                         KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

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

MODE = "full"


def patched_attention_paged(cfg_, q, new_k, new_v, layer_caches,
                            block_table, write_pos, kv_valid_len,
                            block_pos=None, window=0, sink=0):
    bs = layer_caches["k"].shape[2]
    mb = block_table.shape[1]
    if MODE == "no_write":
        new_caches = layer_caches
    elif MODE == "scatter_wr":
        blk_idx = jnp.clip(write_pos // bs, 0, mb - 1)
        blk = jnp.take_along_axis(block_table, blk_idx, axis=1)[:, 0]
        off = (write_pos % bs)[:, 0]
        qk, sk = qcore.quantize_kv(new_k[:, 0])
        qv, sv = qcore.quantize_kv(new_v[:, 0])
        new_caches = {
            "k": layer_caches["k"].at[blk, :, off].set(qk),
            "v": layer_caches["v"].at[blk, :, off].set(qv),
            "k_scale": layer_caches["k_scale"].at[blk, :, off].set(sk),
            "v_scale": layer_caches["v_scale"].at[blk, :, off].set(sv),
        }
    else:
        valid = write_pos < kv_valid_len[:, None]
        new_caches = pkv.paged_write(layer_caches, block_table, write_pos,
                                     new_k, new_v, True, valid=valid)
    if MODE == "no_kernel":
        out = new_k[:, 0] + new_caches["k"][0, 0, 0, 0].astype(new_k.dtype)
        return out[:, None].astype(q.dtype), new_caches
    out = paged_decode_attention(
        q[:, 0], new_caches["k"], new_caches["v"],
        new_caches.get("k_scale"), new_caches.get("v_scale"),
        block_table, kv_valid_len, scale=cfg_.head_dim ** -0.5)
    return out[:, None].astype(q.dtype), new_caches


mcommon._attention_paged = patched_attention_paged


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


def build_run(mode, n):
    @jax.jit
    def run(params, lp, tokens, caches, lens, table):
        def step(tokens, caches, lens):
            pos = lens[:, None].astype(jnp.int32)
            x = jnp.take(params["embed"]["w"], tokens, axis=0).astype(
                cfg.dtype)
            sin, cos = mcommon.rope_sin_cos(pos, cfg.head_dim, cfg.rope_theta)
            new_caches = []
            for i in range(NL):
                x, nc = mcommon.decoder_layer(cfg, lp[i], x, sin, cos,
                                              caches[i], pos, lens + 1,
                                              block_table=table)
                new_caches.append(nc)
            x = ops_ref.rmsnorm(x, params["final_norm"]["w"],
                                cfg.rms_norm_eps)
            logits = dispatch.linear(params["lm_head"], x,
                                     cfg.module_algo("lm_head"))
            return logits.astype(jnp.float32), new_caches

        def body(i, carry):
            tokens, caches, lens, acc = carry
            logits, caches = step(tokens, caches, lens)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (nxt[:, None], caches, lens + 1, acc + logits[0, 0, 0])
        out = jax.lax.fori_loop(0, n, body,
                                (tokens, caches, lens, jnp.float32(0)))
        return out[3]
    return run


def main():
    global MODE
    print("devices:", jax.devices(), flush=True)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    state = init_paged_kv(cfg, NB, BS)
    lp = [jax.tree.map(lambda a: a[i], params["layers"])
          for i in range(NL)]
    caches0 = [{"k": state.k[i], "v": state.v[i],
                "k_scale": state.k_scale[i], "v_scale": state.v_scale[i]}
               for i in range(NL)]
    tok0 = jnp.ones((B, 1), jnp.int32)
    lens0 = jnp.full((B,), CTX, jnp.int32)
    table = jnp.asarray(
        np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))

    args = (params, lp, tok0, caches0, lens0, table)
    for mode in ("full", "no_write", "no_kernel", "scatter_wr"):
        MODE = mode
        t = slope(lambda n: build_run(mode, n), args)
        print(f"{mode:10s}: {t*1e6:8.1f} us/step ({t*1e6/NL:.1f}/layer)",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
