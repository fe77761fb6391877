"""Serve-startup benchmark: cold vs cached warmup (r3 VERDICT missing #5).

The reference ships a serialized engine + timing cache
(/root/reference/tensorrt_llm/builder.py:601-651,785): build once offline,
every server start deserializes. The jit-world equivalent is the
persistent XLA compilation cache (cli serve --cache_dir): the FIRST
`serve --warmup` start compiles and persists every serving program; every
LATER start loads them. This bench measures both starts at a given
geometry and prints the startup table for docs/PERF.md:

    {"cold_warmup_s": ..., "cached_warmup_s": ..., "programs": N,
     "cold_compiled": N, "cached_loaded": N, ...}

It runs the measurement in a SUBPROCESS twice (same --cache_dir, fresh
process each time — a warm in-process jit cache would fake the result).

Usage: python tools/startup_bench.py [--layers 32] [--burst 16]
       [--cache_dir /tmp/mixq_startup_cache] [--fresh]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def child(args):
    import jax
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    sys.path.insert(0, str(REPO))
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.quant import (KVCacheQuantAlgo, QuantAlgo,
                                             QuantConfig)
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
    from mixq_tensorrt_llm_tpu.utils import compile_watch

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=args.layers, num_heads=32, num_kv_heads=32, head_dim=128,
        quant=QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=128,
                          kv_cache=KVCacheQuantAlgo.INT8))
    t0 = time.time()
    import jax as _jax
    params = mllama.init_random_params(cfg, _jax.random.PRNGKey(0))
    _jax.block_until_ready(_jax.tree_util.tree_leaves(params)[0])
    stage_s = time.time() - t0

    t0 = time.time()
    # modest pool: the metric is compile-vs-load time, not capacity
    ex = Executor(params, cfg, max_batch=8, max_seq_len=640,
                  block_size=128, prefill_chunk=256, prefill_lanes=4,
                  seed=0)
    c0, h0 = compile_watch.compile_count(), compile_watch.cache_hit_count()
    ex.warmup(prompt_len=256, burst=args.burst)
    warm_s = time.time() - t0
    print(json.dumps({
        "stage_s": round(stage_s, 1), "warmup_s": round(warm_s, 1),
        "compiled": compile_watch.compile_count() - c0,
        "cache_loaded": compile_watch.cache_hit_count() - h0,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--burst", type=int, default=16)
    ap.add_argument("--cache_dir", default="/tmp/mixq_startup_cache")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the cache dir first (measure a true cold "
                         "start)")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    if args.fresh and os.path.isdir(args.cache_dir):
        shutil.rmtree(args.cache_dir)
    os.makedirs(args.cache_dir, exist_ok=True)

    def run(tag):
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, __file__, "--child", "--layers",
             str(args.layers), "--burst", str(args.burst),
             "--cache_dir", args.cache_dir],
            capture_output=True, text=True, timeout=3600)
        wall = time.time() - t0
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"{tag} start failed")
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rec["process_wall_s"] = round(wall, 1)
        print(f"[{tag}] {rec}", file=sys.stderr, flush=True)
        return rec

    cold = run("cold" if args.fresh else "start-1")
    cached = run("cached")
    print(json.dumps({
        "layers": args.layers, "burst": args.burst,
        "cold": cold, "cached": cached,
        "warmup_speedup": round(cold["warmup_s"]
                                / max(cached["warmup_s"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
