"""Decode weight-streaming probe, round 4: slope timing.

r3 exposed that float() readback costs ~50 ms RTT, flooring every
measurement whose total in-loop work is below that. Fix: run the same
chained loop at two iteration counts and report
(T_hi - T_lo) / (I_hi - I_lo) — the RTT and any fixed dispatch cost cancel.

Weights are (L, K, N) stacks indexed i % L per iteration (anti-hoist; the
scanned-model access pattern).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

L = 8

SHAPES = [  # llama-2-7b fused linears
    ("qkv", 4096, 12288),
    ("o", 4096, 4096),
    ("gate_up", 4096, 22016),
    ("down", 11008, 4096),
]


def make_run(step, iters):
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
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc
    return run


def slope_time(step, args, lo=256, hi=1024):
    """Seconds per iteration via two-point slope (RTT cancels)."""
    run_lo, run_hi = make_run(step, lo), make_run(step, hi)
    float(run_lo(*args))          # compile
    float(run_hi(*args))
    t_lo = min(_t(run_lo, args) for _ in range(2))
    t_hi = min(_t(run_hi, args) for _ in range(2))
    return (t_hi - t_lo) / (hi - lo)


def _t(run, args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


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
            scol = jnp.abs(jax.random.normal(kw, (n,), jnp.float32)) + 0.1
            wbf = None
            for tag, step, args, bytes_ in (
                ("int8_dot", lambda x, qw: int8_dot(x, qw, scol),
                 (x, qw), k * n),
                ("conv_dot", lambda x, qw: conv_dot(x, qw, scol),
                 (x, qw), k * n),
                ("bf16_dot", bf16_dot, "BF16", 2 * k * n),
            ):
                if args == "BF16":
                    wbf = (qw.astype(jnp.bfloat16) * 0.01)
                    args = (x, wbf)
                t = slope_time(step, args)
                print(f"M={m:4d} {name:8s} {tag:9s} {t*1e6:8.1f} us "
                      f"{bytes_/t/1e9:6.1f} GB/s", flush=True)
            del wbf
    # free stacks between shapes happens via GC


def probe_chain4():
    key = jax.random.PRNGKey(1)
    int8_bytes = sum(k * n for _, k, n in SHAPES)
    for m in (16, 64, 256):
        x = jax.random.normal(key, (m, 4096), jnp.bfloat16)
        stacks, scols = [], []
        for name, k, n in SHAPES:
            kw = jax.random.fold_in(key, k + n)
            stacks.append(jax.random.randint(kw, (L, k, n), -127, 128,
                                             jnp.int8))
            scols.append(jnp.abs(jax.random.normal(kw, (n,), jnp.float32))
                         * 0.001 + 0.001)

        def layer(x, wq, wo, wg, wd):
            h = int8_dot(x, wq, scols[0])[:, :4096]
            h = int8_dot(h, wo, scols[1])
            g = int8_dot(h, wg, scols[2])
            g = (g[:, :11008] * jax.nn.sigmoid(
                g[:, :11008].astype(jnp.float32)).astype(jnp.bfloat16)
                * g[:, 11008:])
            return int8_dot(g, wd, scols[3])[:, :4096]

        t = slope_time(layer, (x, *stacks), lo=128, hi=512)
        print(f"M={m:4d} chain4 int8 {t*1e6:8.1f} us/layer "
              f"{int8_bytes/t/1e9:6.1f} GB/s", flush=True)

        def layer_bf(x, wq, wo, wg, wd):
            h = bf16_dot(x, wq.astype(jnp.bfloat16))[:, :4096]
            h = bf16_dot(h, wo.astype(jnp.bfloat16))
            g = bf16_dot(h, wg.astype(jnp.bfloat16))
            g = (g[:, :11008] * jax.nn.sigmoid(
                g[:, :11008].astype(jnp.float32)).astype(jnp.bfloat16)
                * g[:, 11008:])
            return bf16_dot(g, wd.astype(jnp.bfloat16))[:, :4096]

        # true bf16 stacks would double HBM; reuse int8 stacks with an
        # in-loop convert — NOT hoistable (stack slice changes per iter),
        # so this measures convert+dot as the bf16-ish comparator
        t = slope_time(layer_bf, (x, *stacks), lo=128, hi=512)
        print(f"M={m:4d} chain4 conv {t*1e6:8.1f} us/layer "
              f"{int8_bytes/t/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    probe_single()
    probe_chain4()
    print("DONE", flush=True)
