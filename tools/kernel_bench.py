"""Per-kernel TPU microbenchmark: Pallas vs XLA(ref) on real shapes.

Usage: python tools/kernel_bench.py [mixed|wo|norm|all]

Timing uses the chained-execution + single-readback method (the axon relay
is fully async; see bench.py).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mixq_tensorrt_llm_tpu.ops import ref, mixed_matmul as mmk, \
    wo_matmul as wok, norm_quant as nqk  # noqa: E402
from mixq_tensorrt_llm_tpu.quant import core as qcore  # noqa: E402


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    first = jax.tree.leaves(out)[0]
    float(jnp.sum(first[:1] if first.ndim else first))  # sync
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        s = jnp.sum(leaf[:1].astype(jnp.float32))
        acc = s if acc is None else acc + s
    float(acc)
    return (time.perf_counter() - t0) / iters


def bench_mixed(m=8192, k=4096, n=12288, ko=128):
    key = jax.random.PRNGKey(0)
    q_x = jax.random.randint(key, (m, k), -127, 128, dtype=jnp.int8)
    srow = jnp.ones((m,), jnp.float32)
    xout = jnp.ones((m, ko), jnp.bfloat16)
    qw = jax.random.randint(key, (k, n), -127, 128, dtype=jnp.int8)
    scol = jnp.ones((n,), jnp.float32)
    fpw = jnp.ones((ko, n), jnp.bfloat16)

    flops = 2 * m * n * (k + ko)
    t_ref = timeit(jax.jit(lambda *a: ref.mixed_matmul(*a)), q_x, srow, xout,
                   qw, scol, fpw)
    t_pal = timeit(lambda *a: mmk.mixed_matmul(*a), q_x, srow, xout, qw,
                   scol, fpw)
    print(f"mixed_matmul m={m} k={k} n={n}: "
          f"ref {t_ref*1e3:.2f} ms ({flops/t_ref/1e12:.0f} TOPS) | "
          f"pallas {t_pal*1e3:.2f} ms ({flops/t_pal/1e12:.0f} TOPS) | "
          f"speedup {t_ref/t_pal:.2f}x")


def bench_wo(m=4, k=4096, n=11008):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    qw = jax.random.randint(key, (k, n), -127, 128, dtype=jnp.int8)
    scol = jnp.ones((n,), jnp.float32)
    gbs = (m * k * 2 + k * n + m * n * 2) / 1e9
    t_ref = timeit(jax.jit(lambda *a: ref.wo_matmul(*a)), x, qw, scol)
    t_pal = timeit(lambda *a: wok.wo_matmul(*a), x, qw, scol)
    print(f"wo_matmul m={m} k={k} n={n}: "
          f"ref {t_ref*1e3:.3f} ms ({gbs/t_ref:.0f} GB/s) | "
          f"pallas {t_pal*1e3:.3f} ms ({gbs/t_pal:.0f} GB/s) | "
          f"speedup {t_ref/t_pal:.2f}x")


def bench_norm(m=8192, k=4096, ko=128):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    gamma = jnp.ones((k,), jnp.float32)
    ind = jnp.arange(ko, dtype=jnp.int32) * (k // ko)
    gbs = (m * k * 2 + m * k + m * ko * 2) / 1e9
    t_ref = timeit(jax.jit(lambda x, g, i: ref.rmsnorm_quant_split(x, g, i)),
                   x, gamma, ind)
    t_pal = timeit(lambda x, g, i: nqk.rmsnorm_quant_split(x, g, i),
                   x, gamma, ind)
    print(f"rmsnorm_quant_split m={m} k={k}: "
          f"ref {t_ref*1e3:.3f} ms ({gbs/t_ref:.0f} GB/s) | "
          f"pallas {t_pal*1e3:.3f} ms ({gbs/t_pal:.0f} GB/s) | "
          f"speedup {t_ref/t_pal:.2f}x")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("mixed", "all"):
        bench_mixed()
        bench_mixed(m=512)       # small-batch prefill
    if which in ("wo", "all"):
        bench_wo()
        bench_wo(m=256)
    if which in ("norm", "all"):
        bench_norm()
