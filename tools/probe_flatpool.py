"""Ablate the per-layer full-pool copies seen in decode-step traces.

Pools are carried FLAT — (L*NB, Hkv, BS, D) with per-layer page rows at
layer*NB + page — so the proven 4D decode kernel (176 us/layer standalone)
works on stacked pools via a fused table, and lax.scan carries the whole
pool (no per-layer slice/stack).

Modes isolate who forces XLA to copy the pools every layer (trace showed
2x ~565 us full-pool copies per layer = ~1.13 ms/layer):
  dus        status-quo write (fori dynamic_update_slice) + pallas kernel
  nowrite    pallas kernel only (pool never written)
  nokernel   DUS write + XLA-only read (dynamic_slice one page per seq)
  aliaswrite pallas RMW page-write kernel (input_output_aliases) + kernel

Run: python tools/probe_flatpool.py [mode ...]; MIXQ_TRACE=dir traces the
hi run instead of slope timing.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

B, HQ, HKV, D = 16, 32, 32, 128
BS, CTX, NL = 128, 1024, 2
MB = CTX // BS + 3
NB = B * MB + 1


# ---------------------------------------------------------------------------
# aliased page-write kernel: read-modify-write the full target page
# ---------------------------------------------------------------------------

def _write_kernel(pg_ref, off_ref,                     # scalar prefetch
                  nk_ref, nv_ref, ns_k_ref, ns_v_ref,  # (1,H,D)/(1,1,H)
                  ki_ref, vi_ref, ksi_ref, vsi_ref,    # aliased pool pages
                  ko_ref, vo_ref, kso_ref, vso_ref):
    i = pl.program_id(0)
    off = off_ref[i]
    col3 = jax.lax.broadcasted_iota(jnp.int32, (HKV, BS, D), 1)
    sel3 = col3 == off
    ko_ref[0] = jnp.where(sel3, nk_ref[0][:, None, :], ki_ref[0])
    vo_ref[0] = jnp.where(sel3, nv_ref[0][:, None, :], vi_ref[0])
    col2 = jax.lax.broadcasted_iota(jnp.int32, (HKV, BS), 1)
    sel2 = col2 == off
    kso_ref[0] = jnp.where(sel2, ns_k_ref[0, 0][:, None], ksi_ref[0])
    vso_ref[0] = jnp.where(sel2, ns_v_ref[0, 0][:, None], vsi_ref[0])


def alias_write(pools, pg, off, new_k, new_v):
    """pools: (k,v int8 (NP,H,BS,D); ks,vs f32 (NP,H,BS)); pg/off (B,);
    new_k/new_v (B,H,D) bf16. Returns updated pools (aliased in-place)."""
    k4, v4, ks4, vs4 = pools
    np_, h, bs, d = k4.shape
    qk, sk = qcore.quantize_kv(new_k)
    qv, sv = qcore.quantize_kv(new_v)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(new_k.shape[0],),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, pg, off: (i, 0, 0)),
            pl.BlockSpec((1, h, d), lambda i, pg, off: (i, 0, 0)),
            pl.BlockSpec((1, 1, h), lambda i, pg, off: (i, 0, 0)),
            pl.BlockSpec((1, 1, h), lambda i, pg, off: (i, 0, 0)),
            pl.BlockSpec((1, h, bs, d), lambda i, pg, off: (pg[i], 0, 0, 0)),
            pl.BlockSpec((1, h, bs, d), lambda i, pg, off: (pg[i], 0, 0, 0)),
            pl.BlockSpec((1, h, bs), lambda i, pg, off: (pg[i], 0, 0)),
            pl.BlockSpec((1, h, bs), lambda i, pg, off: (pg[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, bs, d), lambda i, pg, off: (pg[i], 0, 0, 0)),
            pl.BlockSpec((1, h, bs, d), lambda i, pg, off: (pg[i], 0, 0, 0)),
            pl.BlockSpec((1, h, bs), lambda i, pg, off: (pg[i], 0, 0)),
            pl.BlockSpec((1, h, bs), lambda i, pg, off: (pg[i], 0, 0)),
        ],
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k4.shape, k4.dtype),
            jax.ShapeDtypeStruct(v4.shape, v4.dtype),
            jax.ShapeDtypeStruct(ks4.shape, ks4.dtype),
            jax.ShapeDtypeStruct(vs4.shape, vs4.dtype),
        ],
        # operand indices count scalar-prefetch args (pg=0, off=1)
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
    )(pg, off, qk, qv, sk[:, None, :], sv[:, None, :], k4, v4, ks4, vs4)


# ---------------------------------------------------------------------------
# step bodies
# ---------------------------------------------------------------------------

def build_run(mode, n):
    table = jnp.asarray(
        np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))

    def layer_body(mode, x, pools, layer, lens, blk, off):
        k4, v4, ks4, vs4 = pools
        new_k = (x[:, :HKV * D]).reshape(B, HKV, D).astype(jnp.bfloat16)
        new_v = new_k * 0.5
        pg = layer * NB + blk
        if mode in ("dus", "nokernel"):
            caches = {"k": k4, "v": v4, "k_scale": ks4, "v_scale": vs4}
            caches = pkv._paged_write_decode(caches, pg, off, new_k, new_v,
                                             quantized=True)
            k4, v4, ks4, vs4 = (caches["k"], caches["v"],
                                caches["k_scale"], caches["v_scale"])
        elif mode == "aliaswrite":
            k4, v4, ks4, vs4 = alias_write((k4, v4, ks4, vs4), pg, off,
                                           new_k, new_v)
        if mode == "nokernel":
            pages = jax.vmap(
                lambda p: jax.lax.dynamic_slice(
                    k4, (p, 0, 0, 0), (1, HKV, BS, D)))(pg)
            red = jnp.sum(pages.astype(jnp.float32),
                          axis=tuple(range(1, pages.ndim)))     # (B,)
            out = red[:, None] * jnp.ones((B, HQ * D), jnp.float32) * 1e-9
        else:
            attn = paged_decode_attention(
                x[:, :HQ * D].reshape(B, HQ, D).astype(jnp.bfloat16),
                k4, v4, ks4, vs4, layer * NB + table, lens + 1,
                scale=D ** -0.5)
            out = attn.reshape(B, HQ * D).astype(jnp.float32)
        x = x + out.astype(x.dtype) * 1e-3
        return x, (k4, v4, ks4, vs4)

    @jax.jit
    def run(x0, pools, lens):
        def step(s, carry):
            x, pools, lens = carry
            blk = table[:, 0] * 0 + (lens // BS)   # page idx within seq
            blk = jnp.take_along_axis(
                table, jnp.clip(lens[:, None] // BS, 0, MB - 1), axis=1)[:, 0]
            off = lens % BS

            def lbody(carry, layer):
                x, pools = carry
                x, pools = layer_body(mode, x, pools, layer, lens, blk, off)
                return (x, pools), None
            (x, pools), _ = jax.lax.scan(
                lbody, (x, pools), jnp.arange(NL, dtype=jnp.int32))
            return (x, pools, lens + 1)
        x, pools, lens = jax.lax.fori_loop(0, n, step, (x0, pools, lens))
        return jnp.sum(x)
    return run


def _t(run, args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def main():
    modes = sys.argv[1:] or ["dus", "nowrite", "nokernel", "aliaswrite"]
    print("devices:", jax.devices(), flush=True)
    k4 = jnp.zeros((NL * NB, HKV, BS, D), jnp.int8)
    v4 = jnp.zeros((NL * NB, HKV, BS, D), jnp.int8)
    ks4 = jnp.ones((NL * NB, HKV, BS), jnp.float32)
    vs4 = jnp.ones((NL * NB, HKV, BS), jnp.float32)
    pools = (k4, v4, ks4, vs4)
    x0 = jnp.ones((B, HQ * D), jnp.float32)
    lens = jnp.full((B,), CTX, jnp.int32)
    args = (x0, pools, lens)

    trace_dir = os.environ.get("MIXQ_TRACE")
    for mode in modes:
        lo, hi = build_run(mode, 16), build_run(mode, 64)
        t0 = time.time()
        float(lo(*args)); float(hi(*args))
        print(f"{mode}: compiled in {time.time()-t0:.0f}s", flush=True)
        if trace_dir:
            jax.profiler.start_trace(f"{trace_dir}/{mode}")
            float(hi(*args))
            jax.profiler.stop_trace()
            print(f"{mode}: traced", flush=True)
            continue
        t_lo = min(_t(lo, args) for _ in range(2))
        t_hi = min(_t(hi, args) for _ in range(2))
        t = (t_hi - t_lo) / 48
        print(f"{mode:10s}: {t*1e6:8.1f} us/step ({t*1e6/NL:7.1f}/layer)",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
