"""Pure-math quantization core (CPU-testable, jittable).

This module is the single source of truth for the MixQ quantization recipe
(SURVEY §0), re-derived for TPU:

  * weights: per-output-channel symmetric int8, ``scale_col = absmax/127``
    (reference: MixQ/src/mixquant/modules/linear.py:112-118,
    modelopt/torch/export/model_config_utils.py:429-431)
  * int4 weights: ``scale = absmax/10``, clamp to [-8, 7]
    (reference: linear.py:119-142, 254-262 — the /10 + clamp is intentional
    saturation, not a bug; we reproduce the math exactly)
  * activations: per-token (per-row) dynamic symmetric int8,
    ``scale_row = absmax/127`` computed after the outlier channels have been
    zeroed (reference: kernel/i8gemm.cu:66-107 FindRowScaleKernel)
  * outlier channels: top-k input channels by calibrated activation absmax
    (reference: smooth_quant_get_act.py:13-50, model_config_utils.py:448-453)

TPU-first divergence (documented): the reference stores TWO int8 copies of
each weight — `weight` (outlier cols zeroed, prefill) and `qweight` (full,
decode W8A16) — plus fp16-container bit-packing. Because activations are
zeroed at outlier channels *before* quantization, ``q(x) @ W_q`` is identical
whether or not W_q's outlier rows are zeroed, so we keep a single full int8
weight in natural dtype and halve weight HBM traffic.

Weight layout convention: logical weights are stored **(in_features,
out_features)** ("kernel" layout, y = x @ w), which keeps the contraction on
the leading axis and maps directly onto the MXU without transposes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
INT4_DIV = 10.0   # reference's int4 scale divisor (linear.py:135-139)
INT4_LO, INT4_HI = -8, 7


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------

def weight_scale_int8(w: jax.Array) -> jax.Array:
    """Per-output-channel scale for int8: absmax / 127.

    ``w``: (in, out) float. Returns (out,) float32.
    """
    return (jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / INT8_MAX).clip(1e-8)


def quantize_weight_int8(w: jax.Array, scale: Optional[jax.Array] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-out-channel int8 quantization. Returns (q[int8], scale)."""
    if scale is None:
        scale = weight_scale_int8(w)
    q = jnp.round(w.astype(jnp.float32) / scale[None, :])
    q = jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def weight_scale_int4(w: jax.Array) -> jax.Array:
    """Per-output-channel scale for int4: absmax / 10 (reference rule)."""
    return (jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / INT4_DIV).clip(1e-8)


def quantize_weight_int4(w: jax.Array, scale: Optional[jax.Array] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-out-channel int4 quantization with the reference's
    saturating clamp. Returns (q[int8 holding values in [-8,7]], scale)."""
    if scale is None:
        scale = weight_scale_int4(w)
    q = jnp.round(w.astype(jnp.float32) / scale[None, :])
    q = jnp.clip(q, INT4_LO, INT4_HI).astype(jnp.int8)
    return q, scale


def dequantize_weight(q: jax.Array, scale: jax.Array,
                      dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize (in,out) int weights with per-out-channel scales."""
    return (q.astype(jnp.float32) * scale[None, :].astype(jnp.float32)).astype(dtype)


def quantize_weight_int4_grouped(w: jax.Array, group_size: int = 128
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Group-wise symmetric int4: every `group_size` input rows of each
    output channel share one scale (stock TRT-LLM W4A16_GPTQ/AWQ grouping;
    the reference fork only carries per-channel int4 with the absmax/10
    rule). True absmax/7 scaling over the [-7, 7] range — per-group scales
    localize outliers so quantization error tracks the GROUP's dynamic
    range, not the whole channel's.

    w (in, out) -> (q int8-held int4 (in, out), scale f32 (in/G, out)).
    """
    k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    wg = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    scale = (jnp.max(jnp.abs(wg), axis=1) / 7.0).clip(1e-8)   # (G', n)
    q = jnp.round(wg / scale[:, None, :])
    q = jnp.clip(q, -7, 7).astype(jnp.int8).reshape(k, n)
    return q, scale


def dequantize_weight_grouped(q: jax.Array, scale: jax.Array,
                              dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize (in,out) int4 weights with (in/G, out) group scales."""
    k, n = q.shape
    g = scale.shape[0]
    wg = q.astype(jnp.float32).reshape(g, k // g, n) * scale[:, None, :]
    return wg.reshape(k, n).astype(dtype)


# ---------------------------------------------------------------------------
# int4 <-> packed storage (two nibbles per uint8)
# ---------------------------------------------------------------------------

def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int8-held int4 values (in, out) -> int8 (in//2, out).

    K-HALF layout: packed[k] holds row k in the low nibble and row
    k + in/2 in the high nibble. Unpacking is then a contiguous
    concatenation (no sublane interleave), and the Pallas weight-only
    kernel consumes the packed tensor directly by splitting the activation
    K axis in half — the TPU answer to the reference's in-kernel
    dequantize_s4_to_fp16x2 (kernel/i8gemm.cu:306-369) and interleaved
    CUTLASS preprocessors: HBM reads stay 0.5 bytes per weight.
    """
    assert q.shape[0] % 2 == 0, "in_features must be even to pack int4"
    half = q.shape[0] // 2
    lo = q[:half] & 0xF
    hi = q[half:] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """int8 (in//2, out) -> int8 (in, out), sign-extending each nibble.

    Inverse of pack_int4's K-half layout: low nibbles are rows [0, in/2),
    high nibbles rows [in/2, in)."""
    p = packed.astype(jnp.int8)
    lo = ((p << 4).astype(jnp.int8) >> 4)   # arithmetic sign-extend
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=0)


# ---------------------------------------------------------------------------
# Outlier selection
# ---------------------------------------------------------------------------

def select_outliers(act_scale: jax.Array, k: int) -> jax.Array:
    """Top-k input channels by calibrated activation absmax.

    ``act_scale``: (in,) per-input-channel activation absmax from calibration
    (reference: model_config_utils.py:446-448 uses torch.sort descending and
    takes the first 128). Returns sorted ascending int32 indices — order does
    not affect the math and ascending order gathers faster on TPU.
    """
    _, idx = jax.lax.top_k(act_scale.astype(jnp.float32), k)
    return jnp.sort(idx).astype(jnp.int32)


def split_outlier_weight(w: jax.Array, fp_ind: jax.Array,
                         dtype=jnp.bfloat16) -> jax.Array:
    """Extract outlier weight rows W[fp_ind, :] -> (k, out) high-precision.

    (Reference keeps W[:, ind] columns of the (out,in) torch weight —
    same tensor in our (in,out) layout; model_config_utils.py:448-453.)
    """
    return w[fp_ind, :].astype(dtype)


def outlier_mask(fp_ind: jax.Array, in_features: int) -> jax.Array:
    """Boolean (in,) mask that is True at outlier channels."""
    mask = jnp.zeros((in_features,), dtype=bool)
    return mask.at[fp_ind].set(True)


# ---------------------------------------------------------------------------
# Activation quantization (per-token dynamic)
# ---------------------------------------------------------------------------

def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8: scale_row = absmax/127 along the last axis.

    ``x``: (..., in) float with outlier channels already zeroed.
    Returns (q[int8 same shape], scale_row[... ,] float32).
    Mirrors FindRowScaleKernel (kernel/i8gemm.cu:66-107).
    """
    xf = x.astype(jnp.float32)
    scale = (jnp.max(jnp.abs(xf), axis=-1) / INT8_MAX).clip(1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -INT8_MAX, INT8_MAX)
    return q.astype(jnp.int8), scale


def extract_outliers_and_zero(x: jax.Array, fp_ind: jax.Array
                              ) -> Tuple[jax.Array, jax.Array]:
    """Gather outlier activation channels and zero them in-place.

    Returns (x_outliers (..., k), x_zeroed (..., in)).
    Mirrors ExtractOutliersAndSetToZeros (kernel/i8gemm.cu:198-244).
    """
    x_out = jnp.take(x, fp_ind, axis=-1)
    x_zeroed = x * (~outlier_mask(fp_ind, x.shape[-1])).astype(x.dtype)
    return x_out, x_zeroed


# ---------------------------------------------------------------------------
# KV-cache quantization
# ---------------------------------------------------------------------------

FP8_MAX = 448.0   # float8_e4m3 finite max


def quantize_kv(kv: jax.Array, axis: int = -1,
                dtype=jnp.int8) -> Tuple[jax.Array, jax.Array]:
    """Symmetric quantized KV with per-(token, head) scales.

    ``kv``: (..., head_dim). dtype int8 (default) or float8_e4m3fn
    (reference kv_cache_quant_algo INT8 / FP8). Finer-grained than the
    reference's per-tensor KV scale — strictly more accurate and free on
    TPU because the scale rides along with the block.
    """
    kvf = kv.astype(jnp.float32)
    if dtype == jnp.float8_e4m3fn:
        scale = (jnp.max(jnp.abs(kvf), axis=axis, keepdims=True)
                 / FP8_MAX).clip(1e-8)
        q = (kvf / scale).astype(jnp.float8_e4m3fn)
        return q, scale.squeeze(axis)
    scale = (jnp.max(jnp.abs(kvf), axis=axis, keepdims=True) / INT8_MAX).clip(1e-8)
    q = jnp.clip(jnp.round(kvf / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale.squeeze(axis)


def quantize_weight_fp8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-out-channel float8_e4m3 weight quantization (reference stock
    FP8 algo): scale_col = absmax / 448, qweight e4m3. w (in, out)."""
    wf = w.astype(jnp.float32)
    scale = (jnp.max(jnp.abs(wf), axis=0) / FP8_MAX).clip(1e-8)
    return (wf / scale[None, :]).astype(jnp.float8_e4m3fn), scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16,
                  axis: int = -1) -> jax.Array:
    return (q.astype(jnp.float32) * jnp.expand_dims(scale, axis)).astype(dtype)


# ---------------------------------------------------------------------------
# Full per-linear quantization artifact (what the converter emits)
# ---------------------------------------------------------------------------

class MixQLinearArtifact(NamedTuple):
    """All tensors for one mixed-precision linear (SURVEY §2.4, TPU layout).

    qweight:   int8 (in, out)        full quantized weight (NOT zeroed; see
                                     module docstring for why one copy works)
    scale_col: float32 (out,)        per-out-channel weight scale
    fp_ind:    int32 (k,)            outlier input-channel indices (sorted)
    fp_weight: bfloat16 (k, out)     high-precision outlier weight rows
    """
    qweight: jax.Array
    scale_col: jax.Array
    fp_ind: jax.Array
    fp_weight: jax.Array


def make_mix_artifact(w: jax.Array, act_scale: jax.Array, num_outliers: int,
                      bits: int = 8) -> MixQLinearArtifact:
    """Quantize one linear weight (in,out) into the MixQ artifact set.

    num_outliers is clamped to in_features (tiny models in tests have fewer
    channels than the production default of 128)."""
    fp_ind = select_outliers(act_scale, min(num_outliers, w.shape[0]))
    fp_weight = split_outlier_weight(w, fp_ind)
    if bits == 8:
        qweight, scale = quantize_weight_int8(w)
    elif bits == 4:
        qweight, scale = quantize_weight_int4(w)
    else:
        raise ValueError(f"unsupported bits={bits}")
    return MixQLinearArtifact(qweight, scale.astype(jnp.float32),
                              fp_ind, fp_weight)


def make_lr_artifact(w: jax.Array, rank: int = 32):
    """W8A8 + low-rank correction (MUXQ-style, calibration-free): the
    weight-quantization residual R = W - deq(Q) is approximated by a
    rank-r SVD, so the forward adds two small dense GEMMs instead of the
    outlier gather + side-GEMM. Returns (qweight, scale_col, u (in,r),
    v (r,out))."""
    qweight, scale = quantize_weight_int8(w)
    resid = (w.astype(jnp.float32)
             - qweight.astype(jnp.float32) * scale[None, :])
    r = int(min(rank, *w.shape))
    u_f, s_f, vt_f = jnp.linalg.svd(resid, full_matrices=False)
    u = (u_f[:, :r] * s_f[:r][None, :]).astype(jnp.bfloat16)
    v = vt_f[:r].astype(jnp.bfloat16)
    return qweight, scale.astype(jnp.float32), u, v
