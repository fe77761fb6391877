"""Latency + memory sweep: per-config prefill latency, decode per-token
latency, and device memory — the reference's benchlatency.py / benchflops
sweep (MixQ top-level scripts; VERDICT P12 "latency/VRAM sweep").

Sweeps (batch, prompt_len) pairs at 7B geometry (depth-scaled like
bench.py), printing one JSON line per config:
  {"bs": B, "seq": S, "algo": ..., "prefill_ms": ..., "decode_ms_tok": ...,
   "hbm_gb": ...}

Usage:
  python tools/latency_bench.py [--bf16] [--layers 8]
      [--configs 1x128,1x1024,8x512,16x512]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--configs", default="1x128,1x1024,8x512,16x512")
    ap.add_argument("--decode_iters", type=int, default=16)
    args = ap.parse_args()

    from mixq_tensorrt_llm_tpu.models import (ModelConfig, init_kv_cache,
                                              forward, llama as mllama,
                                              common as mcommon)
    from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                             KVCacheQuantAlgo)
    from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv
    from mixq_tensorrt_llm_tpu.utils.profiler import device_memory_stats

    quant = QuantConfig() if args.bf16 else QuantConfig(
        algo=QuantAlgo.INT8_MIX, num_outliers=128,
        kv_cache=KVCacheQuantAlgo.INT8)
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=args.layers,
                      num_heads=32, num_kv_heads=32, head_dim=128,
                      quant=quant)
    scale = 32 / args.layers
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    algo = "bf16" if args.bf16 else "int8_mix"

    for spec in args.configs.split(","):
        bs, seq = (int(x) for x in spec.split("x"))

        # --- prefill latency (chained, slope-timed) ---
        tokens = jax.random.randint(jax.random.PRNGKey(1), (bs, seq), 0,
                                    cfg.vocab_size, dtype=jnp.int32)
        pos = jnp.tile(jnp.arange(seq, dtype=jnp.int32), (bs, 1))
        lens = jnp.full((bs,), seq, jnp.int32)

        def build_prefill(n):
            @jax.jit
            def run(params, tokens, pos, lens):
                def body(i, carry):
                    tokens, acc = carry
                    tokens = tokens.at[0, 0].set(
                        (i + acc.astype(jnp.int32)) % 1000)
                    cache = init_kv_cache(cfg, bs, seq)
                    lg, _ = forward(params, cfg, tokens, pos, cache, lens,
                                    full_prefill=True)
                    return tokens, acc + lg[0, 0, 0]
                return jax.lax.fori_loop(0, n, body,
                                         (tokens, jnp.float32(0)))[1]
            return run

        it = 4
        lo, hi = build_prefill(it), build_prefill(4 * it)
        float(lo(params, tokens, pos, lens))
        float(hi(params, tokens, pos, lens))
        t_lo = t_hi = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(lo(params, tokens, pos, lens))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(hi(params, tokens, pos, lens))
            t_hi = min(t_hi, time.perf_counter() - t0)
        prefill_ms = (t_hi - t_lo) / (3 * it) * 1e3 * scale

        # --- decode per-token latency at this context ---
        bsz = 128
        mb = -(-(seq + 4 * args.decode_iters) // bsz) + 1
        state = init_paged_kv(cfg, bs * mb + 1, bsz)
        table = jnp.asarray(
            np.arange(1, bs * mb + 1, dtype=np.int32).reshape(bs, mb))
        lens0 = jnp.full((bs,), seq, jnp.int32)
        tok0 = jnp.ones((bs, 1), jnp.int32)

        def build_decode(n):
            @jax.jit
            def run(params, tokens, state, lens):
                def body(i, carry):
                    tokens, state, lens, acc = carry
                    p = lens[:, None].astype(jnp.int32)
                    lg, state = mcommon.forward_paged(
                        params, cfg, tokens, p, state, table, lens + 1)
                    nxt = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
                    return nxt[:, None], state, lens + 1, acc + lg[0, 0, 0]
                return jax.lax.fori_loop(
                    0, n, body, (tokens, state, lens, jnp.float32(0)))[3]
            return run

        di = args.decode_iters
        dlo, dhi = build_decode(di), build_decode(4 * di)
        float(dlo(params, tok0, state, lens0))
        float(dhi(params, tok0, state, lens0))
        t_lo = t_hi = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(dlo(params, tok0, state, lens0))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(dhi(params, tok0, state, lens0))
            t_hi = min(t_hi, time.perf_counter() - t0)
        decode_ms = (t_hi - t_lo) / (3 * di) * 1e3 * scale

        mem = device_memory_stats()
        hbm = mem.get("bytes_in_use", 0) / 2**30
        print(json.dumps({
            "bs": bs, "seq": seq, "algo": algo, "layers": args.layers,
            "depth_scale": scale,
            "prefill_ms": round(prefill_ms, 2),
            "decode_ms_tok": round(decode_ms, 3),
            "ttft_plus_100tok_ms": round(prefill_ms + 100 * decode_ms, 1),
            "hbm_gb": round(hbm, 2),
        }), flush=True)
        del state, lo, hi, dlo, dhi


if __name__ == "__main__":
    main()
