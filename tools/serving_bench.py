"""End-to-end serving throughput: the real Executor on the real chip.

Full-depth 7B-geometry int8_mix+int8KV, N concurrent requests through the
continuous-batching executor (chunked prefill + burst decode). Reports
wall-clock generated tok/s and TTFT stats — scheduler, sampler, block
manager, and host sync included (the number bench.py's in-jit decode
deliberately excludes). On the axon relay each host round-trip costs
~45 ms; run(burst=k) amortizes it over k decode steps, which is also the
right behavior on real deployments (fewer device syncs).

Usage: python tools/serving_bench.py [--requests 16] [--prompt 512]
       [--gen 128] [--burst 16] [--layers 32]
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--burst", type=int, default=16)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--kv_heads", type=int, default=32,
                    help="GQA: 8 gives Llama-3-8B-like geometry — the KV "
                         "pool shrinks 4x, so deeper gen/batch fits")
    ap.add_argument("--scheme", default="int8_mix",
                    choices=["int8_mix", "int4_mix", "w4a16", "w4a16_g",
                             "w8a16"],
                    help="quantization scheme (int4 weights halve the "
                         "decode weight stream vs int8)")
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--geometry", default="7b", choices=["7b", "13b"],
                    help="13b = BASELINE's Llama-2-13B W4A16 serving "
                         "config (MHA-40, hidden 5120; --layers 40 for "
                         "full depth)")
    ap.add_argument("--block_reuse", action="store_true",
                    help="shared-prompt workload through the prefix cache")
    ap.add_argument("--speculative", action="store_true",
                    help="self-draft run_speculative (acceptance upper "
                         "bound; reports tokens/round)")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--draft_layers", type=int, default=0,
                    help="speculative: build the draft from the target's "
                         "first N layers (0 = full self-draft, the "
                         "acceptance ceiling)")
    ap.add_argument("--dense_draft", action="store_true",
                    help="speculative: round-2 dense bf16 draft cache "
                         "instead of the paged int8 one")
    ap.add_argument("--max_kv_tokens", type=int, default=0,
                    help="KV pool budget in tokens (0 = worst case); "
                         "oversubscription preempts under pressure")
    ap.add_argument("--beams", type=int, default=0,
                    help="run_beams beam width (0 = greedy serving)")
    ap.add_argument("--arrival_rate", type=float, default=0.0,
                    help="Poisson arrivals at this rate (req/s) driven "
                         "through step_serving, like the HTTP server — "
                         "instead of submitting all requests up front "
                         "(drain mode)")
    ap.add_argument("--mixed_burst", type=int, default=8,
                    help="arrival mode: decode burst length behind "
                         "in-flight prefill chunks (1 = single-step "
                         "whenever anything is prefilling)")
    args = ap.parse_args()
    if args.arrival_rate > 0 and (args.beams or args.speculative):
        ap.error("--arrival_rate drives greedy step_serving only "
                 "(beam/speculative modes are drain-mode)")

    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                             KVCacheQuantAlgo)
    from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor

    if args.geometry == "13b":
        geo = dict(hidden_size=5120, intermediate_size=13824, num_heads=40)
        if args.kv_heads == 32:
            args.kv_heads = 40    # 13B default is MHA
    else:
        geo = dict(hidden_size=4096, intermediate_size=11008, num_heads=32)
    cfg = ModelConfig(vocab_size=32000, num_layers=args.layers,
                      num_kv_heads=args.kv_heads, head_dim=128, **geo,
                      quant=QuantConfig(algo=QuantAlgo(args.scheme),
                                        num_outliers=128,
                                        kv_cache=KVCacheQuantAlgo.INT8))
    t0 = time.time()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    print(f"params staged in {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    max_seq = args.prompt + args.gen + max(args.burst, args.gamma + 1) + 8
    # beam mode never touches the executor's own pool (run_beams drives
    # paged_beam_search, which builds its own exactly-sized pool), so
    # shrink it to the minimum and leave HBM to the beam pool
    kv_budget = (128 if args.beams else args.max_kv_tokens)
    ex = Executor(params, cfg, max_batch=args.max_batch,
                  max_seq_len=max_seq, block_size=128, prefill_chunk=256,
                  prefill_lanes=4, seed=0,
                  enable_block_reuse=args.block_reuse,
                  max_kv_tokens=kv_budget)
    rng = np.random.default_rng(0)

    # warmup: compile/load every program the timed workload will use —
    # prefill chunk, decode step, and the FULL pow2 burst ladder (the
    # adaptive tail compiles one program per rung; a production server
    # serves warm, and the persistent XLA cache makes later cold starts
    # cheap). Beam / speculative modes warm their own programs with a
    # one-request dry run.
    shared = rng.integers(1, cfg.vocab_size, args.prompt).tolist()
    # block-reuse mode warms with the SHARED prompt: it primes the prefix
    # cache (production servers hold a warm system-prompt cache) AND
    # compiles the PARTIAL prefill chunk the adopted-prefix remainder
    # lands in (the adaptive chunk sizes it below prefill_chunk; unwarmed
    # it cost a cold compile mid-window — measured 14 s TTFT p50)
    warm_prompt = (list(shared) if args.block_reuse
                   else rng.integers(1, cfg.vocab_size,
                                     args.prompt).tolist())
    if args.beams:
        # warm with the SAME batch shape: the beam-burst program is
        # compiled per (requests x beams) geometry, and a 1-request warm
        # leaves the real program cold inside the timed window
        for _ in range(args.requests):
            ex.submit(list(warm_prompt), max_new_tokens=args.gen)
        ex.run_beams(num_beams=args.beams)
        ex.finished.clear()
    elif args.speculative:
        import dataclasses as _dc
        if args.draft_layers:
            wdcfg = _dc.replace(cfg, num_layers=args.draft_layers)
            wdparams = dict(params)
            wdparams["layers"] = jax.tree.map(
                lambda a: a[:args.draft_layers], params["layers"])
        else:
            wdcfg, wdparams = cfg, params
        ex.submit(warm_prompt, max_new_tokens=args.gen)
        ex.run_speculative(wdparams, wdcfg, gamma=args.gamma,
                           paged_draft=not args.dense_draft)
        ex.finished.clear()
    else:
        ex.submit(warm_prompt, max_new_tokens=args.gen)
        ex.run(burst=args.burst)
        ex.finished.clear()
    if not args.beams:
        # compile everything else the timed window can hit: the pow2
        # burst rungs below args.burst (batch-tail ceilings + the
        # mixed-phase bursts that ride behind prefill chunks) and the
        # 1/2/4-lane prefill program variants. Beam mode skips this —
        # run_beams prefills through its own chunked path.
        ex.warmup(prompt_len=min(args.prompt, 256), burst=args.burst)
        ex.finished.clear()
    print("warm", file=sys.stderr, flush=True)

    def prompt_for(i):
        # block-reuse mode: all requests share the prompt (system-prompt
        # workload); otherwise independent random prompts
        return list(shared) if args.block_reuse else rng.integers(
            1, cfg.vocab_size, args.prompt).tolist()

    if args.arrival_rate > 0:
        # continuous-arrival serving: the regime the HTTP server runs in.
        # Requests arrive mid-flight, so some prefill is almost always in
        # the air; mixed_burst>1 keeps decode at burst speed behind it
        # (mixed_burst=1 reproduces the old one-sync-per-token cliff).
        gaps = np.random.default_rng(1).exponential(
            1.0 / args.arrival_rate, args.requests)
        t_arr = np.cumsum(gaps)
        rids = []
        t0 = time.time()
        start = time.perf_counter()
        while len(rids) < args.requests or ex.has_work:
            now = time.perf_counter() - start
            while len(rids) < args.requests and t_arr[len(rids)] <= now:
                rids.append(ex.submit(prompt_for(len(rids)),
                                      max_new_tokens=args.gen))
            if ex.has_work:
                produced = ex.step_serving(args.burst, args.mixed_burst)
                if (produced == 0 and ex.queue and not ex.prefilling
                        and ex.num_active == 0):
                    raise RuntimeError("stalled: KV pool too small for "
                                       "the next queued request")
            elif len(rids) < args.requests:
                time.sleep(min(0.002, t_arr[len(rids)] - now))
        done = ex.finished
        wall = time.time() - t0
        gen_total = sum(len(done[r].generated) for r in rids)
        ttfts = sorted(done[r].first_token_time - done[r].submit_time
                       for r in rids)
        print(json.dumps({
            "requests": args.requests, "prompt": args.prompt,
            "gen": args.gen, "burst": args.burst,
            "scheme": args.scheme, "geometry": args.geometry,
            "mixed_burst": args.mixed_burst,
            "arrival_rate": args.arrival_rate, "layers": args.layers,
            "wall_s": round(wall, 1),
            "gen_tok_s": round(gen_total / wall, 1),
            "ttft_p50_s": round(ttfts[len(ttfts) // 2], 2),
            "ttft_p99_s": round(ttfts[-1], 2),
            "compiles_since_warmup": ex.compiles_since_warmup,
        }), flush=True)
        return

    t0 = time.time()
    rids = [ex.submit(prompt_for(i), max_new_tokens=args.gen)
            for i in range(args.requests)]
    if args.speculative:
        import dataclasses as _dc
        if args.draft_layers:
            dcfg = _dc.replace(cfg, num_layers=args.draft_layers)
            dparams = dict(params)
            dparams["layers"] = jax.tree.map(
                lambda a: a[:args.draft_layers], params["layers"])
        else:
            dcfg, dparams = cfg, params
        done = ex.run_speculative(dparams, dcfg, gamma=args.gamma,
                                  paged_draft=not args.dense_draft)
    elif args.beams:
        done = ex.run_beams(num_beams=args.beams)
    else:
        done = ex.run(burst=args.burst)
    wall = time.time() - t0

    gen_total = sum(len(done[r].generated) for r in rids)
    ttfts = sorted(done[r].finish_time - done[r].submit_time
                   if done[r].first_token_time is None else
                   done[r].first_token_time - done[r].submit_time
                   for r in rids)
    print(json.dumps({
        "requests": args.requests, "prompt": args.prompt, "gen": args.gen,
        "burst": args.burst, "scheme": args.scheme,
        "geometry": args.geometry, "layers": args.layers,
        "wall_s": round(wall, 1),
        "gen_tok_s": round(gen_total / wall, 1),
        "ttft_p50_s": round(ttfts[len(ttfts) // 2], 2),
        "ttft_p99_s": round(ttfts[-1], 2),
        **({"spec_rounds": ex.spec_rounds,
            "tokens_per_round": round(gen_total / max(ex.spec_rounds, 1),
                                      2)} if args.speculative else {}),
        **({"prefix_cache_blocks": ex.bm.prefix_cache_size}
           if args.block_reuse else {}),
        **({"preemptions": ex.preemptions} if args.max_kv_tokens else {}),
        "compiles_since_warmup": ex.compiles_since_warmup,
    }), flush=True)


if __name__ == "__main__":
    main()
