"""Decode weight-streaming probe, round 3: anti-hoist stacked weights.

The r2 probe's loop-invariant weights let XLA hoist int8->bf16 converts out
of the timing loop, polluting the numbers. Here weights come as (L, K, N)
stacks indexed i % L inside the fori_loop — exactly how a scanned model
reads them — so every iteration streams a fresh layer's weight from HBM.

Questions this answers:
  1. Real per-op GB/s for int8-dot vs convert+dot vs bf16-dot at decode M.
  2. Is there a fixed per-op latency floor (o_proj stuck at ~200us)?
     -> compare 1 linear/iter vs the full 4-linear chain/iter.
  3. How do rates scale with M (16 / 64 / 256)?
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

L = 4        # stacked layers (weights cycle i % L)
ITERS = 64

SHAPES = [  # llama-2-7b fused linears
    ("qkv", 4096, 12288),
    ("o", 4096, 4096),
    ("gate_up", 4096, 22016),
    ("down", 11008, 4096),
]


def timed(fn, *args):
    t0 = time.time()
    float(fn(*args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS, compile_s


def chain(step, n_stacks):
    """step(x, w_slice...) with w stacks indexed i % L per iteration."""

    @jax.jit
    def run(x, *stacks):
        def body(i, carry):
            x, acc = carry
            idx = i % L
            ws = [jax.lax.dynamic_index_in_dim(s, idx, 0, keepdims=False)
                  for s in stacks]
            out = step(x, *ws)
            x = jax.lax.dynamic_update_slice(
                x, (out[:1, :1] * 1e-20).astype(x.dtype), (0, 0))
            return (x, acc + out[0, 0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))
        return acc
    assert n_stacks >= 1
    return run


def quant_x(x):
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    srow = jnp.maximum(ax / 127.0, 1e-8)
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / srow), -127, 127
                  ).astype(jnp.int8)
    return qx, srow


def int8_dot(x, qw, scol):
    qx, srow = quant_x(x)
    acc = jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * srow * scol[None, :]).astype(jnp.bfloat16)


def conv_dot(x, qw, scol):
    acc = jnp.dot(x, qw.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return (acc * scol[None, :]).astype(jnp.bfloat16)


def bf16_dot(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32
                   ).astype(jnp.bfloat16)


def probe_single():
    key = jax.random.PRNGKey(0)
    for m in (16, 64, 256):
        for name, k, n in SHAPES:
            kx, kw = jax.random.split(jax.random.fold_in(key, k * n + m))
            x = jax.random.normal(kx, (m, k), jnp.bfloat16)
            qw = jax.random.randint(kw, (L, k, n), -127, 128, jnp.int8)
            wbf = (qw.astype(jnp.bfloat16) * 0.01)
            scol = jnp.abs(jax.random.normal(kw, (n,), jnp.float32)) + 0.1
            for tag, fn, args, bytes_ in (
                ("int8_dot", chain(lambda x, qw: int8_dot(x, qw, scol), 1),
                 (x, qw), k * n),
                ("conv_dot", chain(lambda x, qw: conv_dot(x, qw, scol), 1),
                 (x, qw), k * n),
                ("bf16_dot", chain(bf16_dot, 1), (x, wbf), 2 * k * n),
            ):
                t, c = timed(fn, *args)
                print(f"M={m:4d} {name:8s} {tag:9s} {t*1e6:8.1f} us "
                      f"{bytes_/t/1e9:6.1f} GB/s (compile {c:.0f}s)",
                      flush=True)


def probe_chain4():
    """Full decoder-layer linear chain per iteration: is overhead per-op?"""
    key = jax.random.PRNGKey(1)
    for m in (16, 64, 256):
        x = jax.random.normal(key, (m, 4096), jnp.bfloat16)
        stacks, scols = [], []
        tot = 0
        for name, k, n in SHAPES:
            kw = jax.random.fold_in(key, k + n)
            stacks.append(jax.random.randint(kw, (L, k, n), -127, 128,
                                             jnp.int8))
            scols.append(jnp.abs(jax.random.normal(kw, (n,), jnp.float32))
                         * 0.001 + 0.001)
            tot += k * n

        def layer(x, wq, wo, wg, wd):
            h = int8_dot(x, wq, scols[0])[:, :4096]
            h = int8_dot(h, wo, scols[1])
            g = int8_dot(h, wg, scols[2])
            g = (g[:, :11008] * jax.nn.sigmoid(g[:, :11008].astype(jnp.float32))
                 .astype(jnp.bfloat16) * g[:, 11008:])
            return int8_dot(g, wd, scols[3])[:, :4096]

        t, c = timed(chain(layer, 4), x, *stacks)
        print(f"M={m:4d} chain4 int8_dot {t*1e6:8.1f} us/layer "
              f"{tot/t/1e9:6.1f} GB/s (compile {c:.0f}s)", flush=True)

        def layer_conv(x, wq, wo, wg, wd):
            h = conv_dot(x, wq, scols[0])[:, :4096]
            h = conv_dot(h, wo, scols[1])
            g = conv_dot(h, wg, scols[2])
            g = (g[:, :11008] * jax.nn.sigmoid(g[:, :11008].astype(jnp.float32))
                 .astype(jnp.bfloat16) * g[:, 11008:])
            return conv_dot(g, wd, scols[3])[:, :4096]

        t, c = timed(chain(layer_conv, 4), x, *stacks)
        print(f"M={m:4d} chain4 conv_dot {t*1e6:8.1f} us/layer "
              f"{tot/t/1e9:6.1f} GB/s (compile {c:.0f}s)", flush=True)


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
    print(f"loop overhead: {t*1e6:.1f} us/iter (compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    probe_rtt()
    probe_single()
    probe_chain4()
    print("DONE", flush=True)
