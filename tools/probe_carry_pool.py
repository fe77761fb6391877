"""Probe the carry-pool decode design: stacked (L, NB, H, BS, D) pools live
in the step-loop carry, written in place via 5D dynamic_update_slice at
[layer, block, :, off], and the decode kernel reads the STACKED pool with
the layer index scalar-prefetched into its BlockSpec index map.

Variants:
  unroll5d : python loop over layers (layer index static per pallas call)
  scan5d   : lax.scan over layers, layer index traced from xs

Expected if copies die: ~0.7 ms/layer (write ~0 + kernel 0.25 + linears).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from mixq_tensorrt_llm_tpu.models import (ModelConfig, llama as mllama,
                                          common as mcommon)
from mixq_tensorrt_llm_tpu.ops import ref as ops_ref, dispatch
from mixq_tensorrt_llm_tpu.ops.paged_attention import (_lane_stat,
                                                       _store_stat,
                                                       _mask_positions,
                                                       NEG_INF)
from mixq_tensorrt_llm_tpu.quant import (QuantAlgo, QuantConfig,
                                         KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv

B, BS, CTX = 16, 128, 1024
MB = CTX // BS + 3
NB = B * MB + 1
NL = 2

cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                  intermediate_size=11008, num_layers=NL,
                  num_heads=32, num_kv_heads=32, head_dim=128,
                  quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                    num_outliers=128,
                                    kv_cache=KVCacheQuantAlgo.INT8))


def _decode_kernel5d(layer_ref, table_ref, bpos_ref, lens_ref,
                     q_ref, k_ref, v_ref, ks_ref, vs_ref,
                     out_ref, acc_ref, m_ref, l_ref,
                     *, bs, hkv, g, scale, quantized, window, sink):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    hq = hkv * g

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]
    base = bpos_ref[b, j]

    @pl.when(base < seq_len)
    def _():
        k3 = k_ref[0, 0].astype(jnp.bfloat16)          # (Hkv, BS, D)
        v3 = v_ref[0, 0].astype(jnp.bfloat16)
        if quantized:
            k3 = k3 * ks_ref[0, 0][..., None].astype(jnp.bfloat16)
            v3 = v3 * vs_ref[0, 0][..., None].astype(jnp.bfloat16)
        k2 = k3.reshape(hkv * bs, k3.shape[-1])
        v2 = v3.reshape(hkv * bs, v3.shape[-1])
        q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
        logits = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (Hq, Hkv*BS)

        row_h = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv * bs), 0) // g
        col = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv * bs), 1)
        pos = base + col % bs
        keep = (row_h == col // bs) & (pos < seq_len) & \
            _mask_positions(pos, seq_len - 1, window, sink)
        logits = jnp.where(keep, logits, NEG_INF)

        m_prev = _lane_stat(m_ref)
        l_prev = _lane_stat(l_ref)
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - jnp.maximum(m_new, 0.5 * NEG_INF))
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        _store_stat(m_ref, m_new)
        _store_stat(l_ref, l_new)

    @pl.when(j == n_blocks - 1)
    def _():
        out_ref[0] = (acc_ref[:] /
                      jnp.maximum(_lane_stat(l_ref), 1e-20)
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def decode_attn_5d(q, layer, k5, v5, ks5, vs5, block_table, lens, scale):
    """q (B,Hq,D); layer () int32; pools (L, NB, Hkv, BS, D) / (L,NB,Hkv,BS)."""
    b, hq, d = q.shape
    nl, nb, hkv, bs, _ = k5.shape
    mb = block_table.shape[1]
    g = hq // hkv
    block_pos = jnp.broadcast_to(
        jnp.arange(mb, dtype=jnp.int32)[None, :] * bs, (b, mb))
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, mb),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, hkv, bs, d),
                         lambda i, j, lyr, table, *_:
                         (lyr[0], table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, 1, hkv, bs, d),
                         lambda i, j, lyr, table, *_:
                         (lyr[0], table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, 1, hkv, bs),
                         lambda i, j, lyr, table, *_:
                         (lyr[0], table[i, j], 0, 0)),
            pl.BlockSpec((1, 1, hkv, bs),
                         lambda i, j, lyr, table, *_:
                         (lyr[0], table[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, j, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel5d, bs=bs, hkv=hkv, g=g,
                               scale=scale, quantized=True,
                               window=0, sink=0)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(layer_arr, block_table, block_pos, lens, q, k5, v5, ks5, vs5)


def write_5d(pools, layer, blk, off, new_k, new_v):
    """In-place-intended single-token writes into the stacked pools.
    blk/off (B,), new_k/new_v (B, H, D). layer: traced or static scalar."""
    k5, v5, ks5, vs5 = pools
    qk, sk = qcore.quantize_kv(new_k)
    qv, sv = qcore.quantize_kv(new_v)

    def body(i, pools):
        k5, v5, ks5, vs5 = pools
        lk = jnp.reshape(layer, ())
        k5 = jax.lax.dynamic_update_slice(
            k5, qk[i][None, None, :, None, :].astype(k5.dtype),
            (lk, blk[i], 0, off[i], 0))
        v5 = jax.lax.dynamic_update_slice(
            v5, qv[i][None, None, :, None, :].astype(v5.dtype),
            (lk, blk[i], 0, off[i], 0))
        ks5 = jax.lax.dynamic_update_slice(
            ks5, sk[i][None, None, :, None].astype(ks5.dtype),
            (lk, blk[i], 0, off[i]))
        vs5 = jax.lax.dynamic_update_slice(
            vs5, sv[i][None, None, :, None].astype(vs5.dtype),
            (lk, blk[i], 0, off[i]))
        return (k5, v5, ks5, vs5)
    return jax.lax.fori_loop(0, new_k.shape[0], body, (k5, v5, ks5, vs5))


def layer_fwd(lp, x, sin, cos, pools, layer, table, blk, off, lens):
    """Same linear/norm stack as decoder_layer's decode regime."""
    b, s, _ = x.shape
    algo_wo = QuantAlgo.W8A16
    qkv = dispatch.norm_linear(lp["qkv_proj"], x, algo_wo,
                               lp["input_norm"]["w"], eps=cfg.rms_norm_eps)
    q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q = mcommon.apply_rope(q, sin, cos)
    k = mcommon.apply_rope(k, sin, cos)
    pools = write_5d(pools, layer, blk, off, k[:, 0], v[:, 0])
    attn = decode_attn_5d(q[:, 0], layer, *pools, table, lens + 1,
                          scale=cfg.head_dim ** -0.5)
    attn = attn[:, None].reshape(b, s, cfg.q_size).astype(x.dtype)
    x = x + dispatch.linear(lp["o_proj"], attn, algo_wo).astype(x.dtype)
    gate_up = dispatch.norm_linear(lp["gate_up_proj"], x, algo_wo,
                                   lp["post_norm"]["w"],
                                   eps=cfg.rms_norm_eps)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    h = (jax.nn.silu(gate.astype(jnp.float32))
         * up.astype(jnp.float32)).astype(x.dtype)
    x = x + dispatch.linear(lp["down_proj"], h, algo_wo).astype(x.dtype)
    return x, pools


def step_fn(mode, params, layers, tokens, pools, lens, table):
    pos = lens[:, None].astype(jnp.int32)
    x = jnp.take(params["embed"]["w"], tokens, axis=0).astype(cfg.dtype)
    sin, cos = mcommon.rope_sin_cos(pos, cfg.head_dim, cfg.rope_theta)
    blk_idx = jnp.clip(pos[:, 0] // BS, 0, MB - 1)
    blk = jnp.take_along_axis(table, blk_idx[:, None], axis=1)[:, 0]
    off = pos[:, 0] % BS

    if mode == "unroll5d":
        lp = [jax.tree.map(lambda a: a[i], layers) for i in range(NL)]
        for i in range(NL):
            x, pools = layer_fwd(lp[i], x, sin, cos, pools,
                                 jnp.int32(i), table, blk, off, lens)
    else:
        def body(carry, per):
            x, pools = carry
            lp, layer = per
            x, pools = layer_fwd(lp, x, sin, cos, pools, layer, table,
                                 blk, off, lens)
            return (x, pools), None
        (x, pools), _ = jax.lax.scan(
            body, (x, pools), (layers, jnp.arange(NL, dtype=jnp.int32)))

    x = ops_ref.rmsnorm(x, params["final_norm"]["w"], cfg.rms_norm_eps)
    logits = dispatch.linear(params["lm_head"], x,
                             cfg.module_algo("lm_head"))
    return logits.astype(jnp.float32), pools


def build_run(mode, n):
    @jax.jit
    def run(params, layers, tokens, pools, lens, table):
        def body(i, carry):
            tokens, pools, lens, acc = carry
            logits, pools = step_fn(mode, params, layers, tokens, pools,
                                    lens, table)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (nxt[:, None], pools, lens + 1, acc + logits[0, 0, 0])
        out = jax.lax.fori_loop(0, n, body,
                                (tokens, pools, lens, jnp.float32(0)))
        return out[3]
    return run


def slope(build, args, lo=16, hi=64):
    fl, fh = build(lo), build(hi)
    float(fl(*args)); float(fh(*args))
    t_lo = min(_t(fl, args) for _ in range(2))
    t_hi = min(_t(fh, args) for _ in range(2))
    return (t_hi - t_lo) / (hi - lo)


def _t(run, args):
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def main():
    print("devices:", jax.devices(), flush=True)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    state = init_paged_kv(cfg, NB, BS)
    pools0 = (state.k, state.v, state.k_scale, state.v_scale)
    print("pool shapes:", [p.shape for p in pools0], flush=True)
    tok0 = jnp.ones((B, 1), jnp.int32)
    lens0 = jnp.full((B,), CTX, jnp.int32)
    table = jnp.asarray(
        np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))

    args = (params, params["layers"], tok0, pools0, lens0, table)
    for mode in ("unroll5d", "scan5d"):
        t = slope(lambda n, m=mode: build_run(m, n), args)
        print(f"{mode:9s}: {t*1e6:8.1f} us/step ({t*1e6/NL:.1f}/layer)",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
