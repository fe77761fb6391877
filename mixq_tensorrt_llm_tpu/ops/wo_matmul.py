"""Pallas TPU kernel: weight-only W8A16/W4A16 matmul with in-VMEM dequant.

Replaces the reference's fpA_intB CUTLASS GEMM + weightOnlyBatchedGemv decode
kernels (weightonlykernel/fpA_intB_gemm_wrapper.cu:28-66, kernel.h Bs1-4)
and the EETQ cutlass_preprocessors weight interleaving: on TPU no special
interleave is needed — int8 weights are stored (K, N) and dequantized to
bf16 inside VMEM, so HBM reads stay 1 byte/weight. The decode regime (M<=4)
is the same kernel with a small M tile: it is HBM-bandwidth-bound either
way, and the M<=4 / M>4 dispatch heuristic of the reference collapses into
block-shape selection at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import (round_up as _round_up, pick_block as _pick_block,
                    resolve_interpret)


def _wo_kernel(x_ref, qw_ref, scol_ref, out_ref, acc_ref, *, n_k_steps):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:].astype(jnp.bfloat16)      # int8 -> bf16 in VMEM
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == n_k_steps - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scol_ref[:].astype(jnp.float32)
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                             "block_m", "block_n", "block_k"))
def wo_matmul(x, qweight, scale_col, out_dtype=jnp.bfloat16,
              interpret=None, block_m: int = 256,
              block_n: int = 512, block_k: int = 1024):
    """x (M,K) bf16; qweight (K,N) int8 (int4 values ok); scale_col (N,) f32
    -> (M,N). K, N multiples of 128; M padded internally."""
    interpret = resolve_interpret(interpret)
    m, k = x.shape
    n = qweight.shape[1]
    assert k % 128 == 0 and n % 128 == 0, (k, n)

    bm = min(block_m, _round_up(m, 16))   # decode: tiny M tiles are fine
    bn = _pick_block(n, block_n)
    bk = _pick_block(k, block_k)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    n_k_steps = k // bk
    grid = (m_pad // bm, n // bn, n_k_steps)

    out = pl.pallas_call(
        functools.partial(_wo_kernel, n_k_steps=n_k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),
            pl.BlockSpec((1, bn), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k * 2 + k * n + m_pad * n * 2 + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qweight, scale_col[None, :])
    return out[:m]




# ---------------------------------------------------------------------------
# packed int4: HBM reads 0.5 bytes/weight, nibbles split in VMEM
# ---------------------------------------------------------------------------

def _unpack_nibbles_bf16(p8):
    """Packed int8 block -> (lo, hi) signed-nibble bf16 planes.

    i32 shifts + i32->bf16 converts. Alternatives measured on chip
    (2026-08-20 shootout, 16x13824 @ 6912x5120 block): this route streams
    the packed tensor at 884 GB/s — AT memory speed, 2x faster than both
    an i32->i8->bf16 downcast chain (445) and the reference-style
    magic-number bitcast dequant (471; i16 shifts don't legalize in
    Mosaic at all, and the f32-magic variant pays an f32->bf16 truncate
    per element). The unpack is NOT the packed path's bottleneck."""
    p = p8.astype(jnp.int32)                  # sign-extended packed
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)      # signed low nibble
    hi = (p >> 4).astype(jnp.bfloat16)               # signed high nibble
    return lo, hi


def _wo_packed_kernel(x_lo_ref, x_hi_ref, qp_ref, scol_ref, out_ref, acc_ref,
                      *, n_k_steps):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_nibbles_bf16(qp_ref[:])
    acc_ref[:] += jnp.dot(x_lo_ref[:], lo, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(x_hi_ref[:], hi, preferred_element_type=jnp.float32)

    @pl.when(k_step == n_k_steps - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scol_ref[:].astype(jnp.float32)
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                             "block_m", "block_n", "block_k"))
def wo_matmul_packed(x, qweight_packed, scale_col, out_dtype=jnp.bfloat16,
                     interpret=None, block_m: int = 256,
                     block_n: int = 1024, block_k: int = 2048):
    """x (M, K) bf16; qweight_packed int8 (K//2, N) in quant.core.pack_int4's
    K-HALF layout (low nibble = row k, high nibble = row k + K/2);
    scale_col (N,) f32 -> (M, N).

    The reference streams packed int4 through the GEMM and dequantizes in
    registers (kernel/i8gemm.cu:306-369 dequantize_s4_to_fp16x2, Int4b
    weightOnlyBatchedGemv): here the packed tensor is the only weight HBM
    traffic (0.5 bytes/weight) and the two nibble planes dot against the
    matching halves of the activation K axis — no interleave, no unpacked
    copy in HBM. block_k counts PACKED rows (bk packed rows = 2*bk logical).

    Bandwidth ceiling (on-chip block sweep, 2026-08-20, composed 13B
    layer scan at M=16): the Mosaic pipeline tops out at ~340 GB/s of
    HBM traffic regardless of blocking ((512,512) 294 -> (2048,1024)
    339; cf. the ~310 GB/s Pallas sequential-copy ceiling in docs/PERF.md
    envelope), while an XLA int8 dot streams 678 GB/s. The tuned blocks
    below make packed int4 match the int8 XLA dot's TIME (468 us/layer)
    at HALF the bytes — int4's win on this chip is therefore CAPACITY
    (13B full depth on 16 GB), not rate, until Mosaic DMA reaches XLA's
    streaming bandwidth.
    """
    interpret = resolve_interpret(interpret)
    m, k = x.shape
    kp, n = qweight_packed.shape
    assert k == 2 * kp, (k, kp)
    if not interpret:
        assert kp % 128 == 0 and n % 128 == 0, (kp, n)

    bm = min(block_m, _round_up(m, 16))
    bn = _pick_block(n, block_n)
    bk = _pick_block(kp, block_k)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    n_k_steps = kp // bk
    grid = (m_pad // bm, n // bn, n_k_steps)

    out = pl.pallas_call(
        functools.partial(_wo_packed_kernel, n_k_steps=n_k_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),   # x rows [0, K/2)
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),   # x rows [K/2, K)
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),
            pl.BlockSpec((1, bn), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k * 2 + kp * n + m_pad * n * 2 + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x[:, :kp].astype(jnp.bfloat16), x[:, kp:].astype(jnp.bfloat16),
      qweight_packed, scale_col[None, :])
    return out[:m]


# ---------------------------------------------------------------------------
# packed int4 with PER-GROUP scales (QuantAlgo.W4A16_G)
# ---------------------------------------------------------------------------

def _wo_packed_grouped_kernel(x_lo_ref, x_hi_ref, qp_ref, sg_ref,
                              out_ref, acc_ref, *, n_k_steps, groups_per_blk,
                              gs, n_lo_groups):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_nibbles_bf16(qp_ref[:])
    # per-group scales differ along K, so each group's partial dot is
    # scaled in f32 BEFORE accumulation (exact — no scaled-weight rounding).
    # sg_ref carries the FULL (K/gs, bn) scale column (a per-block
    # (groups_per_blk, bn) slice would break Mosaic's 8-sublane block rule
    # whenever groups_per_blk < 8); the block's rows are dynamic-sliced out.
    base = k_step * groups_per_blk
    for g in range(groups_per_blk):
        rows = slice(g * gs, (g + 1) * gs)
        acc_ref[:] += jnp.dot(x_lo_ref[:, rows], lo[rows, :],
                              preferred_element_type=jnp.float32) \
            * sg_ref[pl.ds(base + g, 1), :].astype(jnp.float32)
        acc_ref[:] += jnp.dot(x_hi_ref[:, rows], hi[rows, :],
                              preferred_element_type=jnp.float32) \
            * sg_ref[pl.ds(n_lo_groups + base + g, 1), :].astype(jnp.float32)

    @pl.when(k_step == n_k_steps - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype",
                                             "interpret", "block_m",
                                             "block_n", "block_k"))
def wo_matmul_packed_grouped(x, qweight_packed, scale_g, group_size: int,
                             out_dtype=jnp.bfloat16, interpret=None,
                             block_m: int = 256, block_n: int = 512,
                             block_k: int = 512):
    """Group-wise packed-int4 matmul: x (M, K) bf16; qweight_packed int8
    (K/2, N) in pack_int4's K-HALF layout; scale_g f32 (K/group_size, N)
    -> (M, N).

    The decode path of QuantAlgo.W4A16_G: HBM weight traffic stays 0.5
    bytes/weight and the per-group scales ride VMEM — the low-nibble rows
    of packed block s cover groups [s*bk/gs, ...), the high-nibble rows
    cover the same block shifted by K/2, so the scale tensor is fed twice
    with two block index maps (reference fpA_intB group-wise GEMM,
    weightonlykernel; group scales replace its per-channel epilogue).
    """
    interpret = resolve_interpret(interpret)
    m, k = x.shape
    kp, n = qweight_packed.shape
    gs = group_size
    assert k == 2 * kp, (k, kp)
    assert kp % gs == 0, ("K/2 must be group-aligned", kp, gs)
    if not interpret:
        assert kp % 128 == 0 and n % 128 == 0 and gs % 128 == 0, (kp, n, gs)

    bm = min(block_m, _round_up(m, 16))
    bn = _pick_block(n, block_n)
    bk = _pick_block(kp, block_k)
    bk = max((bk // gs) * gs, gs)         # group-aligned K blocks
    while kp % bk:
        bk -= gs
    groups_per_blk = bk // gs

    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    n_k_steps = kp // bk
    grid = (m_pad // bm, n // bn, n_k_steps)

    out = pl.pallas_call(
        functools.partial(_wo_packed_grouped_kernel, n_k_steps=n_k_steps,
                          groups_per_blk=groups_per_blk, gs=gs,
                          n_lo_groups=kp // gs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),   # x [0, K/2)
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),   # x [K/2, K)
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),
            pl.BlockSpec((k // gs, bn), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k * 2 + kp * n + m_pad * n * 2
            + (k // gs) * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x[:, :kp].astype(jnp.bfloat16), x[:, kp:].astype(jnp.bfloat16),
      qweight_packed, scale_g)
    return out[:m]
