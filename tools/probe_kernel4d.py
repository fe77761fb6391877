"""Probe: decode kernel consuming pools in NATIVE (NB, Hkv, BS, D) layout
(no trace-level reshape) — tests whether the write+kernel interaction
(~900 us/layer, probe_unrolled_parts) is the pool reshape feeding the
pallas call. Same unrolled 2-layer harness, 'full' mode only.
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
from mixq_tensorrt_llm_tpu.runtime.kv_cache import init_paged_kv
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

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


def _decode_kernel4d(table_ref, bpos_ref, lens_ref,
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
        k3 = k_ref[0].astype(jnp.bfloat16)            # (Hkv, BS, D)
        v3 = v_ref[0].astype(jnp.bfloat16)
        if quantized:
            k3 = k3 * ks_ref[0][..., None].astype(jnp.bfloat16)
            v3 = v3 * vs_ref[0][..., None].astype(jnp.bfloat16)
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
def decode_attn_4d(q, k_pages, v_pages, k_scale, v_scale,
                   block_table, lens, scale):
    b, hq, d = q.shape
    nb, hkv, bs, _ = k_pages.shape
    mb = block_table.shape[1]
    g = hq // hkv
    block_pos = jnp.broadcast_to(
        jnp.arange(mb, dtype=jnp.int32)[None, :] * bs, (b, mb))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, mb),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, hkv, bs, d),
                         lambda i, j, table, *_: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, hkv, bs, d),
                         lambda i, j, table, *_: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, hkv, bs),
                         lambda i, j, table, *_: (table[i, j], 0, 0)),
            pl.BlockSpec((1, hkv, bs),
                         lambda i, j, table, *_: (table[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, j, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_decode_kernel4d, bs=bs, hkv=hkv, g=g,
                               scale=scale, quantized=True,
                               window=0, sink=0)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(block_table, block_pos, lens, q, k_pages, v_pages, k_scale, v_scale)


def patched_attention_paged(cfg_, q, new_k, new_v, layer_caches,
                            block_table, write_pos, kv_valid_len,
                            block_pos=None, window=0, sink=0):
    valid = write_pos < kv_valid_len[:, None]
    new_caches = pkv.paged_write(layer_caches, block_table, write_pos,
                                 new_k, new_v, True, valid=valid)
    out = decode_attn_4d(
        q[:, 0], new_caches["k"], new_caches["v"],
        new_caches["k_scale"], new_caches["v_scale"],
        block_table, kv_valid_len, scale=cfg_.head_dim ** -0.5)
    return out[:, None].astype(q.dtype), new_caches


mcommon._attention_paged = patched_attention_paged


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


def build_run(n):
    @jax.jit
    def run(params, lp, tokens, caches, lens, table):
        def step(tokens, caches, lens):
            pos = lens[:, None].astype(jnp.int32)
            x = jnp.take(params["embed"]["w"], tokens, axis=0).astype(
                cfg.dtype)
            sin, cos = mcommon.rope_sin_cos(pos, cfg.head_dim, cfg.rope_theta)
            new_caches = []
            for i in range(NL):
                x, nc = mcommon.decoder_layer(cfg, lp[i], x, sin, cos,
                                              caches[i], pos, lens + 1,
                                              block_table=table)
                new_caches.append(nc)
            x = ops_ref.rmsnorm(x, params["final_norm"]["w"],
                                cfg.rms_norm_eps)
            logits = dispatch.linear(params["lm_head"], x,
                                     cfg.module_algo("lm_head"))
            return logits.astype(jnp.float32), new_caches

        def body(i, carry):
            tokens, caches, lens, acc = carry
            logits, caches = step(tokens, caches, lens)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (nxt[:, None], caches, lens + 1, acc + logits[0, 0, 0])
        out = jax.lax.fori_loop(0, n, body,
                                (tokens, caches, lens, jnp.float32(0)))
        return out[3]
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    state = init_paged_kv(cfg, NB, BS)
    lp = [jax.tree.map(lambda a: a[i], params["layers"])
          for i in range(NL)]
    caches0 = [{"k": state.k[i], "v": state.v[i],
                "k_scale": state.k_scale[i], "v_scale": state.v_scale[i]}
               for i in range(NL)]
    tok0 = jnp.ones((B, 1), jnp.int32)
    lens0 = jnp.full((B,), CTX, jnp.int32)
    table = jnp.asarray(
        np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))

    args = (params, lp, tok0, caches0, lens0, table)
    t = slope(build_run, args)
    print(f"full_4d   : {t*1e6:8.1f} us/step ({t*1e6/NL:.1f}/layer)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
