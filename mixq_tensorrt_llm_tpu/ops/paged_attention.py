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

Layouts: kv pages (NB, Hkv, BS, D) with D on lanes; scale pages
(NB, Hkv, BS) with BS on lanes (BS % 128 == 0 on TPU). The body loops over
kv heads and works on 2D (BS, D) / (G, BS) tiles — whole-page 3D values
spill vector registers and batched dots do not lower, both measured to be
several times slower than this form.
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
            acc_ref, m_ref, l_ref, *, bs, hkv, g, scale, quantized):
    # NOTE: refs carry a leading block dim of 1 and are indexed [0, ...]
    # directly — routing them through .at[0] sub-refs made Mosaic emit ~5x
    # slower code (measured in the kernel bisect).
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
        pos_col = j * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, g), 0)
        valid = pos_col < seq_len

        # read the running stats ONCE per grid step — per-head dynamic-slice
        # read-modify-writes on scratch were ~10x the whole kernel cost
        m_prev_all = m_ref[:]     # (1, Hq)
        l_prev_all = l_ref[:]
        acc_prev_all = acc_ref[:]  # (Hq, D)

        m_parts, l_parts, acc_parts = [], [], []
        for h in range(hkv):
            k_h = k_ref[0, h].astype(jnp.float32)       # (BS, D)
            v_h = v_ref[0, h].astype(jnp.float32)
            if quantized:
                k_h = k_h * ks_ref[0, h][:, None].astype(jnp.float32)
                v_h = v_h * vs_ref[0, h][:, None].astype(jnp.float32)

            q_h = q_ref[0, pl.ds(h * g, g), :].astype(jnp.float32) * scale
            # (BS, G): contract D; both operands keep D on lanes
            logits = jax.lax.dot_general(
                k_h, q_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = jnp.where(valid, logits, NEG_INF)

            m_prev = m_prev_all[:, h * g:(h + 1) * g]        # (1, G)
            m_new = jnp.maximum(m_prev,
                                jnp.max(logits, axis=0, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new)                      # (BS, G)
            l_parts.append(l_prev_all[:, h * g:(h + 1) * g] * alpha
                           + jnp.sum(p, axis=0, keepdims=True))
            # (G, D): contract BS
            pv = jax.lax.dot_general(
                p, v_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_parts.append(
                acc_prev_all[h * g:(h + 1) * g, :] * alpha.T + pv)
            m_parts.append(m_new)

        m_ref[:] = jnp.concatenate(m_parts, axis=1)
        l_ref[:] = jnp.concatenate(l_parts, axis=1)
        acc_ref[:] = jnp.concatenate(acc_parts, axis=0)

    @pl.when(j == n_blocks - 1)
    def _():
        out_ref[0] = (acc_ref[:] /
                      jnp.maximum(l_ref[:], 1e-20).T).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(q, k_pages, v_pages, k_scale, v_scale,
                           block_table, lens, scale: float,
                           interpret=None):
    """q (B, Hq, D); k/v pages (NB, Hkv, BS, D) [+ scales (NB, Hkv, BS) when
    int8]; block_table (B, MB) int32; lens (B,) kv lengths -> (B, Hq, D).

    On TPU (compiled) the block size must be a multiple of 128 so scale
    pages slice cleanly on lanes; interpret mode has no such constraint.
    Query rows are ordered head-major: row h*G+i is query head h*G+i, which
    matches the (B, Hq, D) reshape of grouped attention.
    """
    interpret = resolve_interpret(interpret)
    b, hq, d = q.shape
    nb, hkv, bs, _ = k_pages.shape
    mb = block_table.shape[1]
    g = hq // hkv
    quantized = k_scale is not None
    if not interpret and quantized:
        assert bs % 128 == 0, (
            f"paged decode kernel needs block_size % 128 == 0 with int8 KV "
            f"(got {bs})")

    if not quantized:   # feed dummy scale refs so the kernel arity is fixed
        k_scale = jnp.ones((nb, hkv, bs), jnp.float32)
        v_scale = k_scale

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, mb),
        in_specs=[
            pl.BlockSpec((1, hq, d),
                         lambda i, j, table, lens: (i, 0, 0)),
            pl.BlockSpec((1, hkv, bs, d),
                         lambda i, j, table, lens: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, hkv, bs, d),
                         lambda i, j, table, lens: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, hkv, bs),
                         lambda i, j, table, lens: (table[i, j], 0, 0)),
            pl.BlockSpec((1, hkv, bs),
                         lambda i, j, table, lens: (table[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hq, d),
                               lambda i, j, table, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.VMEM((1, hq), jnp.float32),   # m (running max, head-major)
            pltpu.VMEM((1, hq), jnp.float32),   # l (running denom)
        ],
    )

    kernel = functools.partial(_kernel, bs=bs, hkv=hkv, g=g, scale=scale,
                               quantized=quantized)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_table, lens, q, k_pages, v_pages, k_scale, v_scale)
    return out
