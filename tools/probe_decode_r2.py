"""Round-2 decode-regime probes: which formulation streams weights fastest?

Decode (M = batch of 16-128 tokens) is HBM-bandwidth-bound on the weight
read. Round 1 measured 30-100 GB/s effective weight bandwidth from both the
XLA convert+dot and the tiled Pallas wo kernel — far under the 310 GB/s
Pallas-copy / 575 GB/s XLA-fusion envelope. This probe batch times, on the
real chip, for the four 7B linear shapes:

  A. ref.wo_matmul            (XLA convert+dot, round-1 default)
  B. XLA int8 dot, M pad 128  (quantize row, int8xint8, dequant epilogue)
  C. Pallas full-N streaming  (grid over K only; weight rows contiguous)
  D. XLA convert+dot, M pad 128
  E. paged decode attention kernel (bs=16, ctx=1024, int8 KV)

Timing: chained dependent steps inside one jit fori_loop, single sync
(the axon relay is async; see docs/PERF.md). Effective GB/s = weight bytes
per step / time.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPES = [  # (name, K, N) llama-2-7b
    ("qkv", 4096, 12288),
    ("o", 4096, 4096),
    ("gate_up", 4096, 22016),
    ("down", 11008, 4096),
]
ITERS = 256


def timed(fn, *args):
    """fn(*args) -> scalar; chained ITERS times inside jit already."""
    t0 = time.time()
    float(fn(*args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS, compile_s


def chain(step):
    """Build jit fn running `step` ITERS times with data dependence."""

    @jax.jit
    def run(x, *ws):
        def body(i, carry):
            x, acc = carry
            out = step(x, *ws)
            # data dependence that cannot be constant-folded
            x = jax.lax.dynamic_update_slice(
                x, (out[:1, :1] * 1e-20).astype(x.dtype), (0, 0))
            return (x, acc + out[0, 0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc
    return run


# --------------------------------------------------------------- variants
def ref_wo(x, qw, scol):
    acc = jnp.dot(x, qw.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return (acc * scol[None, :]).astype(jnp.bfloat16)


def int8_dot_padded(x, qw, scol, m_pad):
    m = x.shape[0]
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    ax = jnp.max(jnp.abs(xp.astype(jnp.float32)), axis=-1, keepdims=True)
    srow = jnp.maximum(ax / 127.0, 1e-8)
    q_x = jnp.clip(jnp.round(xp.astype(jnp.float32) / srow), -127, 127
                   ).astype(jnp.int8)
    acc = jax.lax.dot_general(q_x, qw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * srow * scol[None, :]
    return out[:m].astype(jnp.bfloat16)


def conv_dot_padded(x, qw, scol, m_pad):
    m = x.shape[0]
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    acc = jnp.dot(xp, qw.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return (acc[:m] * scol[None, :]).astype(jnp.bfloat16)


def _stream_kernel(x_ref, qw_ref, scol_ref, out_ref, acc_ref, *, n_k):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], qw_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(s == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scol_ref[:].astype(jnp.float32)
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk",))
def pallas_stream_wo(x, qw, scol, bk):
    m, k = x.shape
    n = qw.shape[1]
    n_k = k // bk
    return pl.pallas_call(
        functools.partial(_stream_kernel, n_k=n_k),
        grid=(n_k,),
        in_specs=[
            pl.BlockSpec((m, bk), lambda s: (0, s)),
            pl.BlockSpec((bk, n), lambda s: (s, 0)),
            pl.BlockSpec((1, n), lambda s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, n), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, qw, scol[None, :])


def pick_bk(k, n, budget=3 * 2**20):
    bk = 128
    for cand in range(128, k + 1, 128):
        if k % cand == 0 and cand * n <= budget:
            bk = cand
    return bk


def probe_gemms():
    key = jax.random.PRNGKey(0)
    for m in (16, 64, 128):
        for name, k, n in SHAPES:
            kx, kw = jax.random.split(jax.random.fold_in(key, k * n + m))
            x = jax.random.normal(kx, (m, k), jnp.bfloat16)
            qw = jax.random.randint(kw, (k, n), -127, 128, jnp.int8)
            scol = jnp.abs(jax.random.normal(kw, (n,), jnp.float32)) + 0.1
            wbytes = k * n

            rows = []
            t, c = timed(chain(ref_wo), x, qw, scol)
            rows.append(("A:ref_wo", t, c))
            t, c = timed(chain(lambda x, qw, scol: int8_dot_padded(
                x, qw, scol, 128)), x, qw, scol)
            rows.append(("B:int8@128", t, c))
            bk = pick_bk(k, n)
            t, c = timed(chain(lambda x, qw, scol: pallas_stream_wo(
                x, qw, scol, bk)), x, qw, scol)
            rows.append((f"C:pl_stream(bk={bk})", t, c))
            if m < 128:
                t, c = timed(chain(lambda x, qw, scol: conv_dot_padded(
                    x, qw, scol, 128)), x, qw, scol)
                rows.append(("D:conv@128", t, c))

            for tag, t, c in rows:
                gbs = wbytes / t / 1e9
                print(f"M={m:4d} {name:8s} {tag:20s} {t*1e6:9.1f} us "
                      f"{gbs:7.1f} GB/s  (compile {c:.0f}s)", flush=True)


def probe_attention():
    from mixq_tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
    bs_, ctx, hkv, hq, d, blk = 16, 1024, 32, 32, 128, 128
    mb = ctx // blk + 1
    nb = bs_ * mb + 1
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (bs_, hq, d), jnp.bfloat16)
    kp = jax.random.randint(key, (nb, hkv, blk, d), -127, 128, jnp.int8)
    vp = jax.random.randint(key, (nb, hkv, blk, d), -127, 128, jnp.int8)
    ks = jnp.abs(jax.random.normal(key, (nb, hkv, blk), jnp.float32)) + 0.01
    table = jnp.arange(1, bs_ * mb + 1, dtype=jnp.int32).reshape(bs_, mb)
    lens = jnp.full((bs_,), ctx, jnp.int32)

    @jax.jit
    def run(q, kp, vp, ks, table, lens):
        def body(i, carry):
            q, acc = carry
            out = paged_decode_attention(q, kp, vp, ks, ks, table, lens,
                                         scale=0.088)
            q = jax.lax.dynamic_update_slice(
                q, (out[:1, :1, :1] * 1e-20).astype(q.dtype), (0, 0, 0))
            return (q, acc + out[0, 0, 0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
        return acc

    t, c = timed(run, q, kp, vp, ks, table, lens)
    kv_bytes = bs_ * ctx * hkv * d * 2 + bs_ * ctx * hkv * 4 * 2
    print(f"E:paged_attn bs=16 ctx=1024 int8: {t*1e6:9.1f} us/layer "
          f"{kv_bytes / t / 1e9:7.1f} GB/s  (compile {c:.0f}s)", flush=True)


def probe_rtt():
    x = jnp.ones((8, 128), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(i, c):
            x, acc = c
            out = x * 1.0000001
            x = jax.lax.dynamic_update_slice(x, out[:1, :1], (0, 0))
            return (x, acc + out[0, 0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc
    t, c = timed(run, x)
    print(f"RTT control: {t*ITERS*1e3:.1f} ms total for {ITERS} trivial steps",
          flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    probe_rtt()
    probe_attention()
    probe_gemms()
    print("DONE", flush=True)
