"""The reference's HEADLINE workload: WikiText-2 PPL-eval throughput.

The README's banner numbers (/root/reference/README.md:7-30 — "batch 32:
35.02 it/s vs AWQ 16.71; batch 512: 21.34 it/s vs AWQ 5.2" on Llama-2-7B)
come from a llama.cpp-style Perplexity harness
(MixQ/src/utils/utils/perplexity_utils.py:101 calculate_perplexity): the
token stream is cut into n_ctx-token windows scored ONE AT A TIME —
"batch 32/512" is the WINDOW LENGTH n_ctx (333,088 tokens / 32 = 10,409
parts; / 512 = 650 ≈ the README's 655), batch dimension 1. One "it" =
one window, so the reference's 35.02 it/s at n_ctx=32 is 1,120 tok/s and
21.34 it/s at n_ctx=512 is 10,926 tok/s.

This bench times the SAME workload shape through eval/ppl.py's jitted
block scorer on 7B-geometry synthetic weights, int8_mix vs bf16:

  * reference shape: batch_size=1 windows of n_ctx 32 / 512 (it/s
    comparable to the README numbers, different hardware);
  * TPU-native shape: the same token budget scored with the windows
    BATCHED (batch 32 x 512-token blocks per call) — single-row forwards
    waste the MXU, and nothing in PPL eval forces them; this is the
    throughput a TPU user actually gets.

bf16 at full 7B depth does not fit beside its activations in 16 GB, so
(like bench.py) both schemes run at --layers depth and scale linearly;
int8_mix full-depth runs are the headline.

Usage: python tools/ppl_bench.py [--layers 32] [--tiny] [--n_tokens N]
Prints one JSON line with it/s + tok/s per (scheme, shape).
"""

import argparse
import json
import sys
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--n_tokens", type=int, default=0,
                    help="token budget per timed config (default: enough "
                         "for ~8 batched calls)")
    ap.add_argument("--schemes", nargs="+",
                    default=["int8_mix", "bf16"])
    ap.add_argument("--tiny", action="store_true", help="CI smoke")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from mixq_tensorrt_llm_tpu.eval.ppl import evaluate_ppl
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.quant.config import QuantAlgo, QuantConfig

    if args.tiny:
        geo = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                   num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                   max_position_embeddings=1024)
    else:
        geo = dict(vocab_size=32000, hidden_size=4096,
                   intermediate_size=11008, num_layers=args.layers,
                   num_heads=32, num_kv_heads=32, head_dim=128,
                   max_position_embeddings=4096)

    # (label, n_ctx, batch): reference shape = batch 1; TPU shape = batched
    shapes = [("ref_nctx32", 32, 1), ("ref_nctx512", 512, 1),
              ("batched_32x512", 512, 32)]

    out = {"layers": geo["num_layers"], "configs": {}}
    rng = np.random.default_rng(0)
    for scheme in args.schemes:
        quant = (QuantConfig() if scheme == "bf16" else
                 QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=128))
        cfg = ModelConfig(**geo, quant=quant)
        t0 = time.time()
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        params = jax.tree.map(lambda a: jax.device_put(a), params)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
        print(f"[{scheme}] params staged in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        for label, n_ctx, batch in shapes:
            per_call = n_ctx * batch
            budget = args.n_tokens or per_call * 8
            if args.tiny:
                budget = per_call * 2
            stream = rng.integers(1, cfg.vocab_size, budget + n_ctx,
                                  dtype=np.int32)
            # warm (compile) on a separate tiny stream
            evaluate_ppl(params, cfg, stream[:per_call + n_ctx],
                         seq_len=n_ctx, batch_size=batch)
            r = evaluate_ppl(params, cfg, stream, seq_len=n_ctx,
                             batch_size=batch)
            key = f"{scheme}/{label}"
            out["configs"][key] = {
                "windows_per_s": round(r.blocks_per_s, 2),
                "tok_per_s": round(r.tokens_per_s, 0),
                "blocks": r.blocks, "elapsed_s": round(r.elapsed_s, 2),
            }
            print(f"{key}: {r.blocks_per_s:.2f} it/s "
                  f"({r.tokens_per_s:.0f} tok/s)", file=sys.stderr,
                  flush=True)
        del params

    ref = {"nctx32_mixq_its": 35.02, "nctx512_mixq_its": 21.34,
           "nctx32_awq_its": 16.71, "nctx512_awq_its": 5.2}
    out["reference_published"] = ref
    print(json.dumps(out))


if __name__ == "__main__":
    main()
