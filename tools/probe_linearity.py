"""Validate the layer-scaled bf16 baseline (bench.py) empirically.

bench.py measures bf16 at 8 layers and scales by L/8 because 7B bf16
doesn't fit HBM. That's only honest if step time is affine in depth with
a small intercept: t(L) = a + b*L, a = embed+lm_head+sampling overhead.
This probe slope-times the prefill step at L in {2, 4, 8} and the decode
step at L in {4, 8}, fits a and b, and reports the intercept fraction of
the 8-layer time and the implied 32-layer extrapolation error of pure
t8*4 scaling vs the affine fit.

Usage: python tools/probe_linearity.py [--decode]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def slope_time(run_lo, run_hi, args_, iters):
    float(run_lo(*args_))
    float(run_hi(*args_))
    t_lo = t_hi = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(run_lo(*args_))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run_hi(*args_))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return (t_hi - t_lo) / (3 * iters)


def prefill_time(layers, bs=16, seq=512, iters=4):
    from mixq_tensorrt_llm_tpu.models import (ModelConfig, init_kv_cache,
                                              forward, llama as mllama)
    from mixq_tensorrt_llm_tpu.quant import QuantConfig
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=layers,
                      num_heads=32, num_kv_heads=32, head_dim=128,
                      quant=QuantConfig())
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (bs, seq), 0,
                                cfg.vocab_size, dtype=jnp.int32)
    pos = jnp.tile(jnp.arange(seq, dtype=jnp.int32), (bs, 1))
    lens = jnp.full((bs,), seq, jnp.int32)

    def build(n):
        @jax.jit
        def run(params, tokens, pos, lens):
            def body(i, carry):
                tokens, acc = carry
                # data-dependent token edit defeats loop-invariant hoisting
                tokens = tokens.at[0, 0].set(
                    (i + acc.astype(jnp.int32)) % 1000)
                cache = init_kv_cache(cfg, bs, seq)
                lg, _ = forward(params, cfg, tokens, pos, cache, lens,
                                full_prefill=True)
                return tokens, acc + lg[0, 0, 0]
            return jax.lax.fori_loop(0, n, body,
                                     (tokens, jnp.float32(0)))[1]
        return run

    t = slope_time(build(iters), build(4 * iters),
                   (params, tokens, pos, lens), iters)
    print(f"prefill bf16 L={layers}: {t*1e3:.1f} ms/step", flush=True)
    return t


def decode_time(layers, bs=16, ctx=1024, iters=16):
    from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
    from mixq_tensorrt_llm_tpu.models import common as mcommon
    from mixq_tensorrt_llm_tpu.quant import QuantConfig
    from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_layers=layers,
                      num_heads=32, num_kv_heads=32, head_dim=128,
                      quant=QuantConfig())
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    bsz = 128
    mb = -(-(ctx + 4 * iters) // bsz) + 1
    state = init_paged_kv(cfg, bs * mb + 1, bsz)
    table = jnp.asarray(np.arange(1, bs * mb + 1, dtype=np.int32).reshape(bs, mb))
    lens0 = jnp.full((bs,), ctx, jnp.int32)
    tok0 = jnp.ones((bs, 1), jnp.int32)

    def build(n):
        @jax.jit
        def run(params, tokens, state, lens):
            def body(i, carry):
                tokens, state, lens, acc = carry
                pos = lens[:, None].astype(jnp.int32)
                lg, state = mcommon.forward_paged(
                    params, cfg, tokens, pos, state, table, lens + 1)
                nxt = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
                return nxt[:, None], state, lens + 1, acc + lg[0, 0, 0]
            return jax.lax.fori_loop(0, n, body,
                                     (tokens, state, lens, jnp.float32(0)))[3]
        return run

    t = slope_time(build(iters), build(4 * iters),
                   (params, tok0, state, lens0), iters)
    print(f"decode bf16 L={layers}: {t*1e3:.2f} ms/step", flush=True)
    return t


def affine_report(name, ls, ts, full=32):
    b = (ts[-1] - ts[0]) / (ls[-1] - ls[0])
    a = ts[-1] - b * ls[-1]
    naive = ts[-1] * full / ls[-1]
    fit = a + b * full
    print(f"{name}: per-layer {b*1e3:.2f} ms, intercept {a*1e3:.2f} ms "
          f"({100*a/ts[-1]:.1f}% of the L={ls[-1]} step); "
          f"L={full}: naive-scale {naive*1e3:.1f} ms vs affine "
          f"{fit*1e3:.1f} ms ({100*(naive-fit)/fit:+.1f}% bias)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decode", action="store_true")
    args = ap.parse_args()
    if args.decode:
        ls = [4, 8]
        ts = [decode_time(l) for l in ls]
        affine_report("decode", ls, ts)
    else:
        ls = [2, 4, 8]
        ts = [prefill_time(l) for l in ls]
        # intermediate-point check: affine fit from {2,8} should predict 4
        b = (ts[2] - ts[0]) / 6
        a = ts[0] - 2 * b
        pred4 = a + 4 * b
        print(f"affine check at L=4: measured {ts[1]*1e3:.1f} ms vs "
              f"predicted {pred4*1e3:.1f} ms "
              f"({100*(ts[1]-pred4)/pred4:+.1f}%)", flush=True)
        affine_report("prefill", [2, 8], [ts[0], ts[2]])


if __name__ == "__main__":
    main()
