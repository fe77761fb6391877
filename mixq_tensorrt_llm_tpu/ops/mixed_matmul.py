"""Pallas TPU kernel: MixQ mixed-precision GEMM (W8A8O16 / W4A8O16).

The TPU-native equivalent of the reference's CUTLASS GemmDequant stack
(kernel/symmetric/gemm/device/gemm_dequant.h:124-210 + epilogue
linear_combination_dequant.h:120-160) and the cuBLAS outlier side-GEMM it
is paired with in the plugin (TsinghuaMixQPlugin.cpp:518-532):

    Out[m,n] = (sum_k q_x[m,k] * qweight[k,n]) * scale_row[m] * scale_col[n]
             + sum_j x_outliers[m,j] * fp_weight[j,n]          (+ silu)

Both contractions run on the MXU; the int8 matmul accumulates in int32, the
dequant rescale + outlier accumulation happen in the f32 epilogue while the
accumulator tile is still VMEM-resident — nothing but int8 weights and the
bf16 output ever touch HBM. The outlier side-GEMM (k=128/256) is issued at
the *first* K step of each (m,n) tile so it seeds the accumulator and the
epilogue is a pure rescale-add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import round_up as _round_up, pick_block as _pick_block, resolve_interpret
from . import ref


def _mixed_kernel(qx_ref, srow_ref, xout_ref, qw_ref, scol_ref, fpw_ref,
                  out_ref, acc_ref, side_ref, *, n_k_steps, silu):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        # outlier side-GEMM seeds the f32 side accumulator (bf16 x bf16 MXU)
        side_ref[:] = jnp.dot(xout_ref[:], fpw_ref[:],
                              preferred_element_type=jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(qx_ref[:], qw_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k_step == n_k_steps - 1)
    def _():
        scaled = (acc_ref[:].astype(jnp.float32)
                  * srow_ref[:].astype(jnp.float32)
                  * scol_ref[:].astype(jnp.float32))
        res = scaled + side_ref[:]
        if silu:
            res = res * jax.nn.sigmoid(res)
        out_ref[:] = res.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("silu", "out_dtype", "interpret",
                                             "block_m", "block_n", "block_k"))
def mixed_matmul(q_x, scale_row, x_outliers, qweight, scale_col, fp_weight,
                 silu: bool = False, out_dtype=jnp.bfloat16,
                 interpret=None, block_m: int = 256,
                 block_n: int = 512, block_k: int = 1024):
    """q_x (M,K) int8; scale_row (M,) f32; x_outliers (M,ko) bf16;
    qweight (K,N) int8; scale_col (N,) f32; fp_weight (ko,N) bf16
    -> (M,N) out_dtype.

    K and N must be multiples of 128; M is padded internally.
    """
    interpret = resolve_interpret(interpret)
    m, k = q_x.shape
    n = qweight.shape[1]
    ko = x_outliers.shape[1]
    assert k % 128 == 0 and n % 128 == 0, (k, n)

    bm = min(block_m, _round_up(m, 128))
    bn = _pick_block(n, block_n)
    bk = _pick_block(k, block_k)

    m_pad = _round_up(m, bm)
    if m_pad != m:
        q_x = jnp.pad(q_x, ((0, m_pad - m), (0, 0)))
        scale_row = jnp.pad(scale_row, (0, m_pad - m))
        x_outliers = jnp.pad(x_outliers, ((0, m_pad - m), (0, 0)))

    n_k_steps = k // bk
    grid = (m_pad // bm, n // bn, n_k_steps)

    out = pl.pallas_call(
        functools.partial(_mixed_kernel, n_k_steps=n_k_steps, silu=silu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),             # q_x
            pl.BlockSpec((bm, 1), lambda i, j, s: (i, 0)),              # srow
            pl.BlockSpec((bm, ko), lambda i, j, s: (i, 0)),             # x_out
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),             # qw
            pl.BlockSpec((1, bn), lambda i, j, s: (0, j)),              # scol
            pl.BlockSpec((ko, bn), lambda i, j, s: (0, j)),             # fp_w
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32),    # int8-GEMM accumulator
            pltpu.VMEM((bm, bn), jnp.float32),  # outlier side accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * (k + ko),
            bytes_accessed=m_pad * k + k * n + m_pad * n * 2
            + (m_pad + n) * 4 + (m_pad + n) * ko * 2,
            transcendentals=m_pad * n if silu else 0,
        ),
        interpret=interpret,
    )(q_x, scale_row[:, None], x_outliers, qweight, scale_col[None, :],
      fp_weight)
    return out[:m]




def _epilogue_kernel(acc_ref, srow_ref, xout_ref, scol_ref, fpw_ref,
                     out_ref, *, silu):
    side = jnp.dot(xout_ref[:], fpw_ref[:],
                   preferred_element_type=jnp.float32)
    res = (acc_ref[:].astype(jnp.float32)
           * srow_ref[:].astype(jnp.float32)
           * scol_ref[:].astype(jnp.float32)) + side
    if silu:
        res = res * jax.nn.sigmoid(res)
    out_ref[:] = res.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("silu", "out_dtype", "interpret",
                                             "block_m", "block_n"))
def mixed_matmul_hybrid(q_x, scale_row, x_outliers, qweight, scale_col,
                        fp_weight, silu: bool = False,
                        out_dtype=jnp.bfloat16, interpret=None,
                        block_m: int = 512, block_n: int = 1024):
    """Mixed GEMM, hybrid schedule: the int8 contraction runs as an XLA
    dot (which reaches near-peak MXU rates that Mosaic-generated matmul
    loops currently do not on this toolchain), and one Pallas epilogue pass
    fuses dequant rescale + the ko-wide outlier side-GEMM + optional SiLU
    while the int32 accumulator tile is VMEM-resident — the accumulator is
    read from HBM exactly once and only the bf16 result is written back.

    This is the production default; `mixed_matmul` (full-Pallas) is kept
    for comparison and for platforms where it wins.
    """
    interpret = resolve_interpret(interpret)
    m, k = q_x.shape
    n = qweight.shape[1]
    ko = x_outliers.shape[1]

    acc = jax.lax.dot_general(
        q_x, qweight, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    bm = min(block_m, _round_up(m, 128))
    bn = _pick_block(n, block_n)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        acc = jnp.pad(acc, ((0, m_pad - m), (0, 0)))
        scale_row = jnp.pad(scale_row, (0, m_pad - m))
        x_outliers = jnp.pad(x_outliers, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, silu=silu),
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),     # acc
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),      # srow
            pl.BlockSpec((bm, ko), lambda i, j: (i, 0)),     # xout
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),      # scol
            pl.BlockSpec((ko, bn), lambda i, j: (0, j)),     # fpw
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(acc, scale_row[:, None], x_outliers, scale_col[None, :], fp_weight)
    return out[:m]


def mix_linear(x, qweight, scale_col, fp_ind, fp_weight, silu=False,
               out_dtype=jnp.bfloat16, interpret=None):
    """Float activations -> quant+split (XLA-fused) -> Pallas mixed GEMM.

    The quant/split stage lives in norm_quant.py when fused with RMSNorm;
    this variant covers mix linears not preceded by a norm (o_proj).
    """
    if interpret:
        q_x, scale_row, x_out = ref.quant_split(x, fp_ind)
    else:
        from . import norm_quant as nq
        q_x, scale_row, x_out = nq.quant_split(x, fp_ind)
    return mixed_matmul(q_x, scale_row, x_out, qweight, scale_col, fp_weight,
                        silu=silu, out_dtype=out_dtype, interpret=interpret)
