"""Pallas TPU kernel: fused RMSNorm -> outlier split -> per-token int8 quant.

TPU equivalent of the reference's single biggest fusion
(mixlib `layernorm_forward_cuda_extract_outliers`,
quantkernel/mix_cuda/layernorm/layernorm.cu:122-416): one VMEM-resident
pass over the activations producing everything the mixed GEMM needs:

    q_x       int8 (M, K) — normed, outlier channels zeroed, quantized
    scale_row f32  (M, 1) — per-token absmax/127
    x_out     bf16 (M,ko) — normed outlier channels

The outlier gather is a (K, ko) one-hot matmul on the MXU (lane-dim gathers
are not a TPU primitive; a 128-column one-hot contraction is ~free next to
the main GEMM) and the zeroing is a (1, K) mask multiply — both derived
from fp_ind at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..quant.core import INT8_MAX
from ._util import round_up as _round_up, resolve_interpret


def _norm_quant_kernel(x_ref, gamma_ref, mask_ref, onehot_ref,
                       qx_ref, srow_ref, xout_ref, *, eps, do_norm):
    xf = x_ref[:].astype(jnp.float32)
    if do_norm:
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * gamma_ref[:].astype(jnp.float32)

    # outlier channels out (bf16 MXU contraction with the one-hot selector)
    xout_ref[:] = jnp.dot(xf.astype(jnp.bfloat16), onehot_ref[:],
                          preferred_element_type=jnp.float32
                          ).astype(xout_ref.dtype)

    # zero outliers, then per-row dynamic quant
    xz = xf * mask_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xz), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / INT8_MAX, 1e-8)
    srow_ref[:] = scale
    q = jnp.clip(jnp.round(xz / scale), -INT8_MAX, INT8_MAX)
    qx_ref[:] = q.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps", "do_norm", "interpret",
                                             "block_m"))
def _norm_quant_split(x, gamma, mask, onehot, eps: float = 1e-6,
                      do_norm: bool = True, interpret=None,
                      block_m: int = 256):
    interpret = resolve_interpret(interpret)
    m, k = x.shape
    ko = onehot.shape[1]
    assert k % 128 == 0, k

    bm = min(block_m, _round_up(m, 32))
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // bm,)
    qx, srow, xout = pl.pallas_call(
        functools.partial(_norm_quant_kernel, eps=eps, do_norm=do_norm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((k, ko), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((bm, ko), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, k), jnp.int8),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, ko), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x, gamma[None, :], mask, onehot)
    return qx[:m], srow[:m, 0], xout[:m]


def _selectors(fp_ind: jax.Array, k: int):
    """fp_ind (ko,) -> (mask (1,K) bf16 zeroing outliers, onehot (K,ko) bf16)."""
    iota = jnp.arange(k, dtype=jnp.int32)
    hit = iota[:, None] == fp_ind[None, :]              # (K, ko)
    onehot = hit.astype(jnp.bfloat16)
    mask = (~jnp.any(hit, axis=1))[None, :].astype(jnp.bfloat16)
    return mask, onehot


def rmsnorm_quant_split(x, gamma, fp_ind, eps: float = 1e-6,
                        interpret=None):
    """Fused RMSNorm+split+quant. x (..., K) -> (q_x, scale_row, x_out) with
    leading dims flattened to M (same contract as ops.ref version)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    mask, onehot = _selectors(fp_ind, k)
    qx, srow, xout = _norm_quant_split(x.reshape(-1, k), gamma, mask, onehot,
                                       eps=eps, do_norm=True,
                                       interpret=interpret)
    return (qx.reshape(*lead, k), srow.reshape(lead),
            xout.reshape(*lead, -1))


def quant_split(x, fp_ind, interpret=None):
    """Outlier split + per-token quant without the norm (o_proj input)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    mask, onehot = _selectors(fp_ind, k)
    gamma = jnp.ones((k,), jnp.float32)
    qx, srow, xout = _norm_quant_split(x.reshape(-1, k), gamma, mask, onehot,
                                       do_norm=False, interpret=interpret)
    return (qx.reshape(*lead, k), srow.reshape(lead),
            xout.reshape(*lead, -1))

