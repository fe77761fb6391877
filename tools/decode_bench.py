"""Decode-throughput benchmark: batched decode steps at a given context.

Decode is HBM-bandwidth-bound, which is where int8 weights + int8 KV show
their full advantage over bf16 (the reference's M<=4 GEMV regime,
weightOnlyBatchedGemv). Uses the paged path (block tables + the Pallas
decode-attention kernel on TPU) driven exactly as the Executor drives it,
with in-jit chained steps for honest timing on the async relay.

Usage: python tools/decode_bench.py [--layers N] [--bs N] [--ctx N] [--bf16]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8,
                    help="depth (scaled to 32 in the report)")
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--bf16", action="store_true",
                    help="unquantized baseline instead of int8_mix")
    ap.add_argument("--int4", action="store_true",
                    help="int4_mix weights (packed in-kernel unpack)")
    ap.add_argument("--w4a16", action="store_true",
                    help="weight-only int4, per-out-channel scales")
    ap.add_argument("--w4a16_g", action="store_true",
                    help="group-wise int4 weights (grouped packed kernel)")
    ap.add_argument("--geometry", default="7b", choices=["7b", "13b"],
                    help="model geometry; 13b is the BASELINE.md "
                         "'Llama-2-13B W4A16 decode path' config — int4 "
                         "weights (~6.5 GB) fit this 16 GB chip at full "
                         "depth where bf16 (24 GB) cannot run at all")
    ap.add_argument("--kv_splits", type=int, default=0,
                    help="flash-decoding page split factor (reference "
                         "--multi_block_mode); 0 = serial page scan")
    args = ap.parse_args()
    if args.kv_splits:
        import os
        os.environ["MIXQ_KV_SPLITS"] = str(args.kv_splits)

    from mixq_tensorrt_llm_tpu.models import (ModelConfig, llama as mllama,
                                              common as mcommon)
    from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                             KVCacheQuantAlgo)
    from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv

    if args.bf16:
        quant = QuantConfig()
    elif args.w4a16_g:
        quant = QuantConfig(algo=QuantAlgo.W4A16_G,
                            kv_cache=KVCacheQuantAlgo.INT8)
    elif args.w4a16:
        quant = QuantConfig(algo=QuantAlgo.W4A16,
                            kv_cache=KVCacheQuantAlgo.INT8)
    elif args.int4:
        quant = QuantConfig(algo=QuantAlgo.INT4_MIX, num_outliers=128,
                            kv_cache=KVCacheQuantAlgo.INT8)
    else:
        quant = QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=128,
                            kv_cache=KVCacheQuantAlgo.INT8)
    geo = (dict(hidden_size=4096, intermediate_size=11008, num_heads=32,
                full_layers=32)
           if args.geometry == "7b" else
           dict(hidden_size=5120, intermediate_size=13824, num_heads=40,
                full_layers=40))
    full_layers = geo.pop("full_layers")
    cfg = ModelConfig(vocab_size=32000, num_layers=args.layers,
                      num_kv_heads=geo["num_heads"], head_dim=128,
                      quant=quant, **geo)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))

    block_size = 128
    # room for ctx + 4*iters decode writes (slope timing's long run)
    mb = -(-(args.ctx + 4 * args.iters) // block_size) + 1
    nb = args.bs * mb + 1
    state = init_paged_kv(cfg, nb, block_size)
    table = np.zeros((args.bs, mb), np.int32)
    nxt = 1
    for i in range(args.bs):
        for j in range(mb):
            table[i, j] = nxt
            nxt += 1
    table = jnp.asarray(table)
    lens0 = jnp.full((args.bs,), args.ctx, jnp.int32)
    tok0 = jnp.ones((args.bs, 1), jnp.int32)

    iters = args.iters

    import functools

    def build_run(n):
        # donate the pools: without it the fori_loop carry forces XLA to
        # copy both KV pools as program temps — ~5 GB at 7B full depth,
        # the exact copy-protection the aliased write kernel exists to
        # avoid (this silently fit on depth-scaled runs and OOM'd every
        # full-depth int4 run before the fix)
        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, tokens, state, lens):
            def body(i, carry):
                tokens, state, lens, acc = carry
                pos = lens[:, None].astype(jnp.int32)
                logits, state = mcommon.forward_paged(
                    params, cfg, tokens, pos, state, table, lens + 1)
                nxt_tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt_tok[:, None], state, lens + 1,
                        acc + logits[0, 0, 0])
            out = jax.lax.fori_loop(0, n, body,
                                    (tokens, state, lens, jnp.float32(0)))
            return out[3], out[1]
        return run

    run = build_run(iters)

    t0 = time.time()
    acc, state = run(params, tok0, state, lens0)
    float(acc)
    print(f"compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
    # slope timing: the relay's ~50 ms readback RTT is paid once per
    # float() sync, flooring short runs — time two iteration counts and
    # take the slope so RTT cancels (docs/PERF.md, round-2 discovery)
    run_hi = build_run(4 * iters)
    t0 = time.time()
    acc, state = run_hi(params, tok0, state, lens0)
    float(acc)
    print(f"compile hi: {time.time()-t0:.0f}s", file=sys.stderr)
    t_lo = t_hi = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        acc, state = run(params, tok0, state, lens0)
        float(acc)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        acc, state = run_hi(params, tok0, state, lens0)
        float(acc)
        t_hi = min(t_hi, time.perf_counter() - t0)
    best = (t_hi - t_lo) / (3 * iters)

    scale = full_layers / args.layers
    step_ms = best * 1e3 * scale
    tok_s = args.bs / (best * scale)
    mode = ("bf16" if args.bf16 else
            "w4a16_g+int8kv" if args.w4a16_g else
            "w4a16+int8kv" if args.w4a16 else
            "int4_mix+int8kv" if args.int4 else "int8_mix+int8kv")
    mode = f"{args.geometry}/{mode}"
    if args.kv_splits:
        mode += f"+kvsplit{args.kv_splits}"
    print(f"decode {mode} bs={args.bs} ctx={args.ctx} "
          f"({args.layers} layers scaled x{scale:.0f}): "
          f"{step_ms:.2f} ms/step -> {tok_s:,.0f} tok/s")


if __name__ == "__main__":
    main()
