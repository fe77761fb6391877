"""Pallas TPU kernel: paged decode attention with in-kernel int8 KV dequant.

The decode-regime replacement for the reference's gpt_attention plugin with
paged + int8 KV cache (binary libnvinfer_plugin kernels; SURVEY §2.3 item
6): one query token per sequence attends over its block-table pages using
flash-decoding-style online softmax. KV pages stream HBM -> VMEM via the
block-spec pipeline with the page index coming from a scalar-prefetched
block table, and int8 pages are dequantized in VMEM — HBM traffic stays
1 byte per cache entry, and no (B, S, H, D) bf16 cache copy is ever
materialized (the jnp reference path does exactly that and is why decode
needs this kernel).

Layout notes: pages are (BS, Hkv, D) with D on lanes; GQA is computed as a
batched (Hkv, G, BS) logits tensor so all heads ride one dot_general.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import resolve_interpret

NEG_INF = -1e30


def _kernel(table_ref, lens_ref,                       # scalar prefetch
            q_ref, k_ref, v_ref, ks_ref, vs_ref,       # inputs
            out_ref,                                   # output
            acc_ref, m_ref, l_ref, *, bs, scale, quantized):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]

    @pl.when(j * bs < seq_len)
    def _():
        # k/v page: (BS, Hkv, D) -> (Hkv, BS, D)
        k = k_ref[:].astype(jnp.float32).transpose(1, 0, 2)
        v = v_ref[:].astype(jnp.float32).transpose(1, 0, 2)
        if quantized:
            k = k * ks_ref[:].astype(jnp.float32).T[:, :, None]
            v = v * vs_ref[:].astype(jnp.float32).T[:, :, None]

        q = q_ref[:].astype(jnp.float32) * scale      # (Hkv, G, D)

        # logits (Hkv, G, BS): batched over kv heads
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        pos = j * bs + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        logits = jnp.where(pos < seq_len, logits, NEG_INF)

        m_prev = m_ref[:]                              # (Hkv, G, 1)
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (Hkv, G, D)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(j == n_blocks - 1)
    def _():
        out_ref[:] = (acc_ref[:] /
                      jnp.maximum(l_ref[:], 1e-20)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(q, k_pages, v_pages, k_scale, v_scale,
                           block_table, lens, scale: float,
                           interpret=None):
    """q (B, Hq, D); k/v pages (NB, BS, Hkv, D) [+ scales (NB, BS, Hkv) when
    int8]; block_table (B, MB) int32; lens (B,) kv lengths -> (B, Hq, D).
    """
    interpret = resolve_interpret(interpret)
    b, hq, d = q.shape
    nb, bs, hkv, _ = k_pages.shape
    mb = block_table.shape[1]
    g = hq // hkv
    quantized = k_scale is not None

    q_r = q.reshape(b, hkv, g, d)
    if not quantized:   # feed dummy scale refs so the kernel arity is fixed
        k_scale = jnp.ones((nb, bs, hkv), jnp.float32)
        v_scale = k_scale

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, mb),
        in_specs=[
            pl.BlockSpec((1, hkv, g, d),
                         lambda i, j, table, lens: (i, 0, 0, 0)),
            pl.BlockSpec((1, bs, hkv, d),
                         lambda i, j, table, lens: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, bs, hkv, d),
                         lambda i, j, table, lens: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, bs, hkv),
                         lambda i, j, table, lens: (table[i, j], 0, 0)),
            pl.BlockSpec((1, bs, hkv),
                         lambda i, j, table, lens: (table[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, g, d),
                               lambda i, j, table, lens: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, g, d), jnp.float32),
            pltpu.VMEM((hkv, g, 1), jnp.float32),
            pltpu.VMEM((hkv, g, 1), jnp.float32),
        ],
    )

    kernel = functools.partial(_kernel, bs=bs, scale=scale,
                               quantized=quantized)

    def body(table_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
             out_ref, acc_ref, m_ref, l_ref):
        kernel(table_ref, lens_ref,
               q_ref.at[0], k_ref.at[0], v_ref.at[0],
               ks_ref.at[0], vs_ref.at[0], out_ref.at[0],
               acc_ref, m_ref, l_ref)

    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_table, lens, q_r, k_pages, v_pages, k_scale, v_scale)
    return out.reshape(b, hq, d)
