"""On-chip compile + parity smoke for the round-2 paged attention kernels.

Runs the rewritten decode kernel and the new prefill kernel on the real
TPU at 7B-ish geometry, checks numerics against the jnp gather reference,
and prints timings. Catch Mosaic lowering errors early (the (1, Hkv*BS)
scale BlockSpec concern from the kernel rewrite).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.ops import ref
from mixq_tensorrt_llm_tpu.ops.paged_attention import (
    paged_decode_attention, paged_prefill_attention)
from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.runtime.kv_cache import paged_gather

B, HQ, HKV, D = 8, 32, 32, 128
BS = 128          # block size
CTX = 1024
MB = CTX // BS
NB = B * MB + 1


def build(quantized):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    k = jax.random.normal(ks[0], (NB, HKV, BS, D), jnp.float32)
    v = jax.random.normal(ks[1], (NB, HKV, BS, D), jnp.float32)
    table = np.arange(1, NB, dtype=np.int32).reshape(B, MB)
    bpos = np.broadcast_to(np.arange(MB, dtype=np.int32)[None] * BS,
                           (B, MB)).copy()
    lens = np.full((B,), CTX, np.int32)
    if quantized:
        qk, sk = qcore.quantize_kv(k)
        qv, sv = qcore.quantize_kv(v)
        return qk, qv, sk, sv, table, bpos, lens
    return (k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), None, None,
            table, bpos, lens)


def gather_ref(q, kp, vp, sk, sv, table, lens, q_start):
    caches = {"k": kp, "v": vp}
    if sk is not None:
        caches.update(k_scale=sk, v_scale=sv)
    k_all, v_all = paged_gather(caches, jnp.asarray(table), jnp.float32)
    smax = k_all.shape[1]
    kv_pos = np.arange(smax)
    c = q.shape[1]
    qpos = np.asarray(q_start)[:, None] + np.arange(c)[None, :]
    mask = (kv_pos[None, None, None, :] <= qpos[:, None, :, None]) & \
           (kv_pos[None, None, None, :] < np.asarray(lens)[:, None, None, None])
    return ref.attention(q.astype(jnp.float32), k_all, v_all,
                         mask=jnp.asarray(mask), scale=D ** -0.5)


def main():
    print("devices:", jax.devices())
    for quantized in (True, False):
        kp, vp, sk, sv, table, bpos, lens = build(quantized)
        tag = "int8" if quantized else "bf16"

        # ---- decode ----
        q = jax.random.normal(jax.random.PRNGKey(7), (B, HQ, D), jnp.bfloat16)
        t0 = time.time()
        out = paged_decode_attention(q, kp, vp, sk, sv, jnp.asarray(table),
                                     jnp.asarray(lens), scale=D ** -0.5,
                                     block_pos=jnp.asarray(bpos))
        out.block_until_ready()
        print(f"decode[{tag}] compile+run {time.time()-t0:.1f}s")
        want = gather_ref(q[:, None].astype(jnp.float32), kp, vp, sk, sv,
                          table, lens, lens - 1)[:, 0]
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - want)))
        print(f"decode[{tag}] max_err {err:.4f}")
        assert err < 0.05, err
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(20):
                out = paged_decode_attention(
                    q, kp, vp, sk, sv, jnp.asarray(table), jnp.asarray(lens),
                    scale=D ** -0.5, block_pos=jnp.asarray(bpos))
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / 20
        kv_bytes = B * CTX * HKV * D * 2 * (1 if quantized else 2)
        print(f"decode[{tag}] {dt*1e3:.3f} ms  {kv_bytes/dt/1e9:.0f} GB/s")

        # ---- prefill ----
        C = 256
        q2 = jax.random.normal(jax.random.PRNGKey(8), (B, C, HQ, D),
                               jnp.bfloat16)
        q_start = np.full((B,), CTX - C, np.int32)
        t0 = time.time()
        out2 = paged_prefill_attention(q2, kp, vp, sk, sv, jnp.asarray(table),
                                       jnp.asarray(q_start), jnp.asarray(lens),
                                       scale=D ** -0.5,
                                       block_pos=jnp.asarray(bpos))
        out2.block_until_ready()
        print(f"prefill[{tag}] compile+run {time.time()-t0:.1f}s")
        want2 = gather_ref(q2, kp, vp, sk, sv, table, lens, q_start)
        err2 = float(jnp.max(jnp.abs(out2.astype(jnp.float32) - want2)))
        print(f"prefill[{tag}] max_err {err2:.4f}")
        assert err2 < 0.05, err2
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(10):
                out2 = paged_prefill_attention(
                    q2, kp, vp, sk, sv, jnp.asarray(table),
                    jnp.asarray(q_start), jnp.asarray(lens),
                    scale=D ** -0.5, block_pos=jnp.asarray(bpos))
            out2.block_until_ready()
            dt = (time.perf_counter() - t0) / 10
        print(f"prefill[{tag}] {dt*1e3:.3f} ms/chunk({C} tok)")
    print("OK")


if __name__ == "__main__":
    main()
