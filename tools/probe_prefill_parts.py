"""Slope-timed breakdown of the PREFILL step at 7B geometry (bs16 s512).

bench.py measures the full int8_mix prefill step at ~713 ms (11.5k tok/s).
Accounting with measured envelope rates (PERF.md):
  linears 32 x ~7.6 ms (int8 425 TOPS) ~ 243 ms
  flash attention 32 x 7.2 ms          ~ 230 ms   (probe_flash.py)
  lm_head (bf16, 8192x4096x32000)      ~   7 ms
leaves ~230 ms unexplained — the quantize/outlier/norm glue around the
mix GEMMs. This probe isolates each piece at the exact shapes the model
runs them, slope-timed (T_hi-T_lo)/(I_hi-I_lo) so the relay RTT cancels.
Every step consumes its loop-carried state as the real input so nothing
can be hoisted or dead-code-eliminated.

Suspects:
  - ref.mixed_matmul computes the outlier side GEMM in FLOAT32
    ((8192,128)@(128,out)); f32 MXU throughput is well below bf16.
  - quantize_activations + extract_outliers are multi-pass elementwise
    over (8192, in) activations per linear (bandwidth-bound).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.ops import ref as ops_ref

L = 4
M = 16 * 512
NO = 128    # outliers

SHAPES = [  # llama-2-7b fused linears (in, out, mix?)
    ("qkv", 4096, 12288, True),
    ("o", 4096, 4096, True),
    ("gate_up", 4096, 22016, True),
    ("down", 11008, 4096, False),   # weight-only W8A16
]


def make_run(step, iters):
    """Chain `iters` dependent steps on state x; weights stacked (L, ...)
    and indexed i % L (anti-hoist)."""
    @jax.jit
    def run(x, stack):
        def body(i, carry):
            x, acc = carry
            idx = i % L
            ws = jax.tree.map(
                lambda s: jax.lax.dynamic_index_in_dim(s, idx, 0,
                                                       keepdims=False),
                stack)
            out = step(x, ws)
            x = jax.lax.dynamic_update_slice(
                x, (out[:1, :1] * 1e-20).astype(x.dtype), (0, 0))
            return (x, acc + out[0, 0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc
    return run


def _t(run, args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def slope_time(name, step, x, stack, lo=32, hi=128):
    run_lo, run_hi = make_run(step, lo), make_run(step, hi)
    float(run_lo(x, stack)); float(run_hi(x, stack))
    t_lo = min(_t(run_lo, (x, stack)) for _ in range(2))
    t_hi = min(_t(run_hi, (x, stack)) for _ in range(2))
    ms = (t_hi - t_lo) / (hi - lo) * 1e3
    print(f"{name:36s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    x4096 = jax.random.normal(key, (M, 4096), jnp.bfloat16)
    x11008 = jax.random.normal(jax.random.fold_in(key, 1), (M, 11008),
                               jnp.bfloat16)
    norm_w = jnp.ones((4096,), jnp.float32)

    arts = {}
    for si, (nm, kin, nout, _mix) in enumerate(SHAPES):
        kq = jax.random.split(jax.random.fold_in(key, 100 + si), 4)
        arts[nm] = {
            "qweight": jax.random.randint(kq[0], (L, kin, nout), -127, 128,
                                          jnp.int8),
            "scale_col": jnp.abs(jax.random.normal(kq[1], (L, nout),
                                                   jnp.float32)) * 0.01,
            "fp_weight": jax.random.normal(kq[2], (L, NO, nout),
                                           jnp.bfloat16) * 0.02,
            "fp_ind": jnp.tile((jnp.arange(NO, dtype=jnp.int32) * 7)
                               % kin, (L, 1)),
            "w_bf16": jax.random.normal(kq[3], (L, kin, nout),
                                        jnp.bfloat16) * 0.02,
        }

    qx4096, _ = qcore.quantize_activations(x4096)
    qx11008, _ = qcore.quantize_activations(x11008)
    xo = jax.random.normal(jax.random.fold_in(key, 2), (M, NO), jnp.bfloat16)

    results = {}

    # 1) pure int8 dot + dequant epilogue (state IS the int8 input)
    for nm, kin, nout, _mix in SHAPES:
        qx = qx11008 if kin == 11008 else qx4096

        def core(x, a):
            acc = jax.lax.dot_general(x, a["qweight"], (((1,), (0,)),
                                                        ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * 0.01
                    * a["scale_col"][None, :]).astype(jnp.bfloat16)
        results[f"int8core_{nm}"] = slope_time(
            f"int8 dot+epilogue {nm}", core, qx, arts[nm])

    # 2) bf16 dot per shape (the baseline side)
    for nm, kin, nout, _mix in SHAPES:
        xin = x11008 if kin == 11008 else x4096

        def bf(x, a):
            return jnp.dot(x, a["w_bf16"],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
        results[f"bf16_{nm}"] = slope_time(f"bf16 dot {nm}", bf, xin,
                                           arts[nm])

    # 3) outlier side GEMM: f32 (as ref.mixed_matmul does) vs bf16
    def side_f32(x, a):
        return jnp.dot(x.astype(jnp.float32),
                       a["fp_weight"].astype(jnp.float32),
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def side_bf16(x, a):
        return jnp.dot(x, a["fp_weight"],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    results["side_f32"] = slope_time("outlier side GEMM f32 (gate_up)",
                                     side_f32, xo, arts["gate_up"])
    results["side_bf16"] = slope_time("outlier side GEMM bf16 (gate_up)",
                                      side_bf16, xo, arts["gate_up"])

    # 4) activation quantize / outlier split / fused norm variant
    def quant_only(x, a):
        qx, sr = qcore.quantize_activations(x)
        return qx[:, :1].astype(jnp.bfloat16) * sr[:, None]

    def split_quant(x, a):
        qx, sr, xout = ops_ref.quant_split(x, a["fp_ind"])
        return qx[:, :1].astype(jnp.bfloat16) * sr[:, None] + xout[:, :1]

    def norm_split_quant(x, a):
        qx, sr, xout = ops_ref.rmsnorm_quant_split(x, norm_w, a["fp_ind"])
        return qx[:, :1].astype(jnp.bfloat16) * sr[:, None] + xout[:, :1]

    results["quant4096"] = slope_time("quantize_activations (M,4096)",
                                      quant_only, x4096, arts["qkv"])
    results["split4096"] = slope_time("outlier split+quant (M,4096)",
                                      split_quant, x4096, arts["qkv"])
    results["normsplit4096"] = slope_time("norm+split+quant (M,4096)",
                                          norm_split_quant, x4096,
                                          arts["qkv"])
    results["quant11008"] = slope_time("quantize_activations (M,11008)",
                                       quant_only, x11008, arts["down"])

    # 5) full mix linear exactly as ref.mix_linear runs it (gate_up shape)
    def mix_full(x, a):
        return ops_ref.mix_linear(x, a["qweight"], a["scale_col"],
                                  a["fp_ind"], a["fp_weight"])
    results["mix_gate_up"] = slope_time("ref.mix_linear gate_up", mix_full,
                                        x4096, arts["gate_up"])

    # 6) rmsnorm alone
    def norm_only(x, a):
        return ops_ref.rmsnorm(x, norm_w)
    results["rmsnorm"] = slope_time("rmsnorm (M,4096)", norm_only, x4096,
                                    arts["qkv"])

    # 7) wo (W8A16) down_proj as the model runs it
    def wo(x, a):
        return ops_ref.wo_matmul(x, a["qweight"], a["scale_col"])
    results["wo_down"] = slope_time("wo_matmul down (W8A16)", wo, x11008,
                                    arts["down"])

    print("\n--- per-layer accounting (ms) ---")
    mix_cores = sum(results[f"int8core_{nm}"]
                    for nm, _, _, m in SHAPES if m)
    glue = (3 * results["normsplit4096"] - 3 * results["quant4096"])
    print(f"3 mix int8 cores: {mix_cores:.3f}")
    print(f"wo down:          {results['wo_down']:.3f}")
    print(f"bf16 all 4:       "
          f"{sum(results[f'bf16_{nm}'] for nm, _, _, _ in SHAPES):.3f}")
    print(f"norm+split+quant x3 + quant(11008): "
          f"{3 * results['normsplit4096'] + results['quant11008']:.3f}")
    print(f"side f32 vs bf16 (gate_up): {results['side_f32']:.3f} vs "
          f"{results['side_bf16']:.3f}")


if __name__ == "__main__":
    main()
