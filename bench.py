"""Headline benchmark: Llama-2-7B-geometry int8_mix prefill + decode.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N,
   "decode_tok_s": N, "decode_vs_bf16": N, ...}

The headline workload mirrors the reference's (WikiText-2 PPL-eval
throughput at batch 32 on Llama-2-7B, README.md:7-30 — a prefill-dominated
job). `vs_baseline` is the speedup over bf16 on the same chip; the driver
north-star is >=2x (BASELINE.md). Prefill on this chip is roofline-capped
at ~1.35x (int8:bf16 MXU dot ratio 1.39, docs/PERF.md), so the JSON also
carries the bandwidth-bound decode regime — bs=16 ctx=1024 paged decode
steps, int8_mix+int8-KV vs bf16 — where int8's 2x HBM saving pays in
full (the reference's weightOnlyBatchedGemv / M<=4 regime).

The bf16 baseline model does not fit in 16 GB HBM at 7B, so both decode
variants and the bf16 prefill baseline run at 8 layers and are scaled by
layer count (per-layer cost is uniform; noted in stderr).

Timing note: the axon relay is fully asynchronous (block_until_ready does
not wait for remote execution and host readback costs ~45 ms RTT), so each
measurement chains K dependent steps on device and syncs once with a
scalar readback. Prefill steps are ~1 s each so one RTT subtraction
suffices; decode steps are ~ms, so decode uses slope timing — two chained
runs at different iteration counts, rate = d_time/d_iters — which cancels
the RTT exactly (docs/PERF.md, round-2 discovery).

Env knobs: MIXQ_BENCH_TINY=1 (CI smoke), MIXQ_BENCH_BS, MIXQ_BENCH_SEQ,
MIXQ_BENCH_ITERS, MIXQ_BENCH_SKIP_DECODE=1.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def build(cfg_kw, quant, batch, seq):
    from mixq_tensorrt_llm_tpu.models import (ModelConfig, init_kv_cache,
                                              forward, llama as mllama)
    cfg = ModelConfig(**cfg_kw, quant=quant)
    t0 = time.time()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 0,
                                cfg.vocab_size, dtype=jnp.int32)
    pos = jnp.tile(jnp.arange(seq, dtype=jnp.int32), (batch, 1))
    lens = jnp.full((batch,), seq, jnp.int32)
    cache = init_kv_cache(cfg, batch, seq)
    log(f"  inputs staged in {time.time() - t0:.1f}s")

    def step(params, tokens, pos, cache, lens, acc):
        logits, new_cache = forward(params, cfg, tokens, pos, cache, lens,
                                    full_prefill=True)
        # reduce to a scalar so full logits never round-trip to host; feed
        # the cache forward so chained steps have a data dependence
        return jax.nn.logsumexp(logits, axis=-1).sum() + acc, new_cache

    fn = jax.jit(step, donate_argnums=(3, 5))
    return fn, params, tokens, pos, cache, lens


def timeit(fn, params, tokens, pos, cache, lens, iters):
    acc = jnp.float32(0.0)
    t0 = time.time()
    acc, cache = fn(params, tokens, pos, cache, lens, acc)
    float(acc)  # full sync: compile + first run + readback
    log(f"  compile+first run {time.time() - t0:.1f}s")

    rtt = measure_rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        acc, cache = fn(params, tokens, pos, cache, lens, acc)
    float(acc)  # one sync for the whole chain
    # clamp: in tiny/CI mode the whole chain is shorter than the RTT noise
    total = max(time.perf_counter() - t0 - rtt, 1e-6)
    return total / iters


def measure_decode(cfg_kw, quant, bs, ctx, layers, iters):
    """Slope-timed paged decode steps; returns seconds/step at `layers`."""
    from mixq_tensorrt_llm_tpu.models import (ModelConfig, llama as mllama,
                                              common as mcommon)
    from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv
    import numpy as np

    cfg = ModelConfig(**dict(cfg_kw, num_layers=layers), quant=quant)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    block_size = 128   # int8-KV decode kernel needs 128-lane pages
    mb = -(-(ctx + 4 * iters) // block_size) + 1
    state = init_paged_kv(cfg, bs * mb + 1, block_size)
    table = jnp.asarray(
        np.arange(1, bs * mb + 1, dtype=np.int32).reshape(bs, mb))
    lens0 = jnp.full((bs,), ctx, jnp.int32)
    tok0 = jnp.ones((bs, 1), jnp.int32)

    import functools

    def build_run(n):
        # donate the pools: without it the fori_loop carry forces XLA to
        # copy both KV pools (2 x 2.5 GB at full depth -> compile-time OOM)
        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, tokens, state, lens):
            def body(i, carry):
                tokens, state, lens, acc = carry
                pos = lens[:, None].astype(jnp.int32)
                logits, state = mcommon.forward_paged(
                    params, cfg, tokens, pos, state, table, lens + 1)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return nxt[:, None], state, lens + 1, acc + logits[0, 0, 0]
            out = jax.lax.fori_loop(
                0, n, body, (tokens, state, lens, jnp.float32(0)))
            return out[3], out[1]
        return run

    run_lo, run_hi = build_run(iters), build_run(4 * iters)
    t0 = time.time()
    acc, state = run_lo(params, tok0, state, lens0)
    float(acc)
    acc, state = run_hi(params, tok0, state, lens0)
    float(acc)
    log(f"  decode compile+first {time.time() - t0:.0f}s")
    t_lo = t_hi = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        acc, state = run_lo(params, tok0, state, lens0)
        float(acc)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        acc, state = run_hi(params, tok0, state, lens0)
        float(acc)
        t_hi = min(t_hi, time.perf_counter() - t0)
    return (t_hi - t_lo) / (3 * iters)


def main():
    from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                             KVCacheQuantAlgo)

    tiny = os.environ.get("MIXQ_BENCH_TINY") == "1"
    iters = int(os.environ.get("MIXQ_BENCH_ITERS", "8"))
    if tiny:
        cfg_kw = dict(vocab_size=1024, hidden_size=256, intermediate_size=512,
                      num_layers=4, num_heads=8, num_kv_heads=8, head_dim=32)
        batch, seq = 4, 64
        baseline_layers = 2
        name = "tiny_int8mix_prefill"
    else:
        cfg_kw = dict(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=32, num_heads=32,
                      num_kv_heads=32, head_dim=128)
        batch = int(os.environ.get("MIXQ_BENCH_BS", "16"))
        seq = int(os.environ.get("MIXQ_BENCH_SEQ", "512"))
        baseline_layers = 8
        name = "llama2_7b_int8mix_prefill"

    mix = QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=128,
                      kv_cache=KVCacheQuantAlgo.INT8)
    while True:
        log(f"[bench] int8_mix model bs={batch} seq={seq} "
            f"({jax.devices()[0].platform})")
        try:
            handles = build(cfg_kw, mix, batch, seq)
            t_mix = timeit(*handles, iters)
            break
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or batch <= 2:
                raise
            batch //= 2
            log(f"[bench] OOM; retrying with bs={batch}")
            handles = None
            import gc
            gc.collect()
            jax.clear_caches()
            gc.collect()
    tok_s = batch * seq / t_mix
    log(f"[bench] int8_mix: {t_mix * 1e3:.1f} ms/step -> {tok_s:,.0f} tok/s")
    del handles

    bl_kw = dict(cfg_kw, num_layers=baseline_layers)
    log(f"[bench] bf16 baseline ({baseline_layers} layers)")
    handles = build(bl_kw, QuantConfig(), batch, seq)
    t_hi_l = timeit(*handles, iters)
    del handles
    full_l = cfg_kw["num_layers"]
    if tiny:
        t_bf16 = t_hi_l * (full_l / baseline_layers)
    else:
        # affine depth extrapolation t(L) = a + b*L: step time is linear in
        # depth but has a real intercept (embed + lm_head + sampling,
        # measured 6.4% of the 8-layer step — tools/probe_linearity.py), so
        # pure t8*(L/8) scaling would overstate the bf16 baseline ~5% and
        # flatter the int8 ratio. Two depths pin the per-layer slope.
        half = baseline_layers // 2
        log(f"[bench] bf16 baseline ({half} layers, for the affine fit)")
        handles = build(dict(cfg_kw, num_layers=half), QuantConfig(),
                        batch, seq)
        t_lo_l = timeit(*handles, iters)
        del handles
        b_layer = (t_hi_l - t_lo_l) / (baseline_layers - half)
        t_bf16 = t_hi_l + (full_l - baseline_layers) * b_layer
        log(f"[bench] bf16 per-layer {b_layer*1e3:.1f} ms, intercept "
            f"{(t_hi_l - baseline_layers*b_layer)*1e3:.1f} ms")
    bf16_tok_s = batch * seq / t_bf16
    log(f"[bench] bf16 (affine-extrapolated to {full_l}L): "
        f"{t_bf16 * 1e3:.1f} ms/step -> {bf16_tok_s:,.0f} tok/s")

    extra = {}
    # tiny mode skips decode: the paged kernel's layouts assume full-size
    # head_dim/page shapes (Mosaic can't lower the tiny-geometry transpose)
    if os.environ.get("MIXQ_BENCH_SKIP_DECODE") != "1" and not tiny:
        d_layers, d_bs, d_ctx, d_iters = baseline_layers, 16, 1024, 16
        scale = cfg_kw["num_layers"] / d_layers
        try:
            # int8 fits full-depth (weights 6.6 GB + int8 pool ~5 GB), so
            # measure it UNSCALED; fall back to depth-scaling on OOM
            try:
                log(f"[bench] decode int8_mix+int8kv bs={d_bs} ctx={d_ctx} "
                    f"(full {cfg_kw['num_layers']} layers)")
                t_d = measure_decode(cfg_kw, mix, d_bs, d_ctx,
                                     cfg_kw["num_layers"], d_iters)
            except jax.errors.JaxRuntimeError as e:
                if "RESOURCE_EXHAUSTED" not in str(e) and \
                        "Ran out of memory" not in str(e):
                    raise
                import gc
                gc.collect()
                jax.clear_caches()
                log(f"[bench] full-depth decode OOM; {d_layers} layers, "
                    "scaled")
                t_d = measure_decode(cfg_kw, mix, d_bs, d_ctx, d_layers,
                                     d_iters) * scale
            log(f"[bench] decode int8_mix: {t_d * 1e3:.2f} ms/step -> "
                f"{d_bs / t_d:,.0f} tok/s")
            log(f"[bench] decode bf16 bs={d_bs} ctx={d_ctx}")
            t_db = measure_decode(cfg_kw, QuantConfig(), d_bs, d_ctx,
                                  d_layers, d_iters) * scale
            log(f"[bench] decode bf16: {t_db * 1e3:.2f} ms/step -> "
                f"{d_bs / t_db:,.0f} tok/s")
            extra = {"decode_tok_s": round(d_bs / t_d, 1),
                     "decode_vs_bf16": round(t_db / t_d, 3),
                     "decode_bs": d_bs, "decode_ctx": d_ctx}
            # serving row: int8 halves weights AND KV so bs=64 fits where
            # bf16 cannot run at all (capacity -> throughput; docs/PERF.md)
            try:
                log(f"[bench] decode int8_mix+int8kv bs=64 ctx={d_ctx} "
                    f"({d_layers} layers, scaled)")
                t64 = measure_decode(cfg_kw, mix, 64, d_ctx, d_layers,
                                     d_iters) * scale
                log(f"[bench] decode int8_mix bs=64: {t64 * 1e3:.2f} "
                    f"ms/step -> {64 / t64:,.0f} tok/s")
                extra["decode_bs64_tok_s"] = round(64 / t64, 1)
                extra["decode_bs64_vs_bf16_best"] = round(
                    (64 / t64) / (d_bs / t_db), 3)
            except Exception as e:
                log(f"[bench] bs=64 decode failed: {e!r}")
            # int4 row (BASELINE's named W4A16 decode config, measured at
            # 7B geometry full depth; 13B-geometry rows live in
            # tools/decode_bench.py --geometry 13b): int4 halves the int8
            # weight stream, the decode bottleneck
            try:
                w4 = QuantConfig(algo=QuantAlgo.W4A16,
                                 kv_cache=KVCacheQuantAlgo.INT8)
                log(f"[bench] decode w4a16+int8kv bs={d_bs} ctx={d_ctx} "
                    f"(full {cfg_kw['num_layers']} layers)")
                t4 = measure_decode(cfg_kw, w4, d_bs, d_ctx,
                                    cfg_kw["num_layers"], d_iters)
                log(f"[bench] decode w4a16: {t4 * 1e3:.2f} ms/step -> "
                    f"{d_bs / t4:,.0f} tok/s")
                extra["decode_w4a16_tok_s"] = round(d_bs / t4, 1)
                extra["decode_w4a16_vs_int8"] = round(t_d / t4, 3)
            except Exception as e:
                log(f"[bench] w4a16 decode failed: {e!r}")
        except Exception as e:   # decode extras must not sink the headline
            log(f"[bench] decode measurement failed: {e!r}")

    # end-to-end SERVING row: the full continuous-batching executor
    # (chunked prefill + adaptive burst decode + scheduler + sampler +
    # block manager + host sync) — the number a deployment actually gets.
    # Round 2 measured serving at ~50% of raw decode (432 vs 856 tok/s);
    # round 3's adaptive burst ladder closes it to ~90% in the
    # decode-dominant regime (serving_bench gen=512 row, docs/PERF.md).
    if os.environ.get("MIXQ_BENCH_SKIP_SERVING") != "1" and not tiny:
        try:
            import gc
            import numpy as np
            from mixq_tensorrt_llm_tpu.models import (ModelConfig,
                                                      llama as mllama)
            from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
            gc.collect()
            jax.clear_caches()
            # decode-dominant shape: short prompts, long gen at bs 32 —
            # the regime where serving reaches parity with raw in-jit
            # decode (docs/PERF.md round-3 sweep: 1181 gen tok/s)
            n_req, plen, glen, burst = 32, 256, 512, 64
            scfg = ModelConfig(**cfg_kw, quant=mix)
            log(f"[bench] serving: {n_req} req, prompt {plen}, gen {glen}, "
                f"burst {burst}")
            t0 = time.time()
            sparams = mllama.init_random_params(scfg, jax.random.PRNGKey(0))
            ex = Executor(sparams, scfg, max_batch=32,
                          max_seq_len=plen + glen + burst + 8,
                          block_size=128, prefill_chunk=256,
                          prefill_lanes=4, seed=0)
            rng = np.random.default_rng(0)
            ex.submit(rng.integers(1, scfg.vocab_size, plen).tolist(),
                      max_new_tokens=glen)
            ex.run(burst=burst)      # warm the full-gen burst sequence
            ex.finished.clear()
            # pow2 rungs below burst + prefill lane variants (tail
            # ceilings and prefill-overlapped mixed bursts hit them)
            ex.warmup(prompt_len=min(plen, 256), burst=burst)
            ex.finished.clear()
            log(f"  staged+warm in {time.time()-t0:.0f}s")
            rids = [ex.submit(rng.integers(1, scfg.vocab_size,
                                           plen).tolist(),
                              max_new_tokens=glen) for _ in range(n_req)]
            t0 = time.perf_counter()
            done = ex.run(burst=burst)
            wall = time.perf_counter() - t0
            gen_total = sum(len(done[r].generated) for r in rids)
            extra["serving_gen_tok_s"] = round(gen_total / wall, 1)
            extra["serving_requests"] = n_req
            extra["serving_gen_per_req"] = glen
            log(f"[bench] serving: {gen_total/wall:,.0f} gen tok/s "
                f"(wall {wall:.1f}s)")
        except Exception as e:   # serving row must not sink the headline
            log(f"[bench] serving measurement failed: {e!r}")

    # 64-lane LONG-GENERATION capacity row (r4 VERDICT weak #7): w4a16
    # weights (3.4 GB) leave HBM for a 38k-token int8-KV budget that
    # int8's 6.7 GB of weights cannot fit beside; demand is 64 x ~790
    # tokens (~50k), so KV-pressure preemption must fire and replay —
    # the regime where budgeting/preemption earn their keep under real
    # pressure (reference executor pause/resume under cache pressure).
    if os.environ.get("MIXQ_BENCH_SKIP_SERVING") != "1" and not tiny:
        try:
            import gc
            import numpy as np
            from mixq_tensorrt_llm_tpu.models import (ModelConfig,
                                                      llama as mllama)
            from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
            from mixq_tensorrt_llm_tpu.quant.config import KVCacheQuantAlgo
            from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
            # the serving row's 32-lane executor still pins its pool +
            # params — drop them or the 10 GB capacity pool OOMs
            try:
                del ex, sparams, done    # noqa: F821
            except NameError:
                pass
            gc.collect()
            jax.clear_caches()
            n_req, plen, glen, burst = 64, 256, 512, 16
            w4 = QuantConfig(algo=QuantAlgo.W4A16, num_outliers=128,
                             kv_cache=KVCacheQuantAlgo.INT8)
            ccfg = ModelConfig(**cfg_kw, quant=w4)
            log(f"[bench] capacity: {n_req} req x gen {glen} w4a16, "
                f"kv budget 38k tokens (int8 weights cannot fit beside)")
            t0 = time.time()
            cparams = mllama.init_random_params(ccfg, jax.random.PRNGKey(0))
            exc = Executor(cparams, ccfg, max_batch=n_req,
                           max_seq_len=plen + glen + burst + 8,
                           block_size=128, prefill_chunk=256,
                           prefill_lanes=4, seed=0, max_kv_tokens=38000)
            rng = np.random.default_rng(0)
            exc.submit(rng.integers(1, ccfg.vocab_size, plen).tolist(),
                       max_new_tokens=glen)
            exc.run(burst=burst)
            exc.finished.clear()
            exc.warmup(prompt_len=min(plen, 256), burst=burst)
            exc.finished.clear()
            log(f"  staged+warm in {time.time()-t0:.0f}s")
            rids = [exc.submit(rng.integers(1, ccfg.vocab_size,
                                            plen).tolist(),
                               max_new_tokens=glen) for _ in range(n_req)]
            t0 = time.perf_counter()
            done = exc.run(burst=burst)
            wall = time.perf_counter() - t0
            gen_total = sum(len(done[r].generated) for r in rids)
            assert all(len(done[r].generated) == glen for r in rids)
            extra["capacity64_w4a16_gen_tok_s"] = round(gen_total / wall, 1)
            extra["capacity64_preemptions"] = exc.preemptions
            log(f"[bench] capacity: {gen_total/wall:,.0f} gen tok/s, "
                f"{exc.preemptions} preemptions (wall {wall:.1f}s)")
        except Exception as e:
            log(f"[bench] capacity measurement failed: {e!r}")

    print(json.dumps({
        "metric": name,
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / bf16_tok_s, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
