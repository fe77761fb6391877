"""jnp reference implementations of every hot op.

These are the semantic ground truth for the Pallas kernels (tests assert
kernel == ref) and the CPU / interpret-mode fallback path. Each function
documents the reference CUDA op it reproduces.

All functions are pure and jittable; XLA already fuses most of them well —
the Pallas versions exist to beat XLA on the fusion patterns it cannot see
(quant epilogues inside matmuls, outlier side-GEMM accumulation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant import core as qcore


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Standard RMSNorm in float32 accumulation."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def layernorm(x: jax.Array, weight: jax.Array, bias=None,
              eps: float = 1e-5) -> jax.Array:
    """Standard LayerNorm (mean-centered) in float32 — the norm of the
    OPT/GPT/NeoX/Falcon/BLOOM/Phi families (reference layers/normalization
    LayerNorm vs RmsNorm)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def rmsnorm_quant_split(
    x: jax.Array, weight: jax.Array, fp_ind: jax.Array, eps: float = 1e-6
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused RMSNorm -> outlier gather -> per-token int8 quantize.

    The single biggest fusion idea carried over from the reference
    (mixlib ``layernorm_forward_cuda_extract_outliers``,
    quantkernel/mix_cuda/layernorm/layernorm.cu:122-416): one pass producing
      q_x       int8  (..., in)  — normed activations, outliers zeroed, quantized
      scale_row f32   (...,)     — per-token scales
      x_outliers bf16 (..., k)   — normed outlier activation channels
    """
    normed = rmsnorm(x, weight, eps)
    x_out, x_zeroed = qcore.extract_outliers_and_zero(normed, fp_ind)
    q_x, scale_row = qcore.quantize_activations(x_zeroed)
    return q_x, scale_row, x_out.astype(jnp.bfloat16)


def quant_split(x: jax.Array, fp_ind: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Outlier gather -> per-token int8 quantize (no norm).

    Used where the input is not preceded by an RMSNorm (e.g. mlp.up output
    feeding down_proj in other routings). Mirrors
    FindRowScaleFusedExtracOutliers (mixlib, cult.cu).
    """
    x_out, x_zeroed = qcore.extract_outliers_and_zero(x, fp_ind)
    q_x, scale_row = qcore.quantize_activations(x_zeroed)
    return q_x, scale_row, x_out.astype(jnp.bfloat16)


def mixed_matmul(
    q_x: jax.Array,          # int8 (m, in)    quantized activations (outliers zeroed)
    scale_row: jax.Array,    # f32  (m,)       per-token activation scales
    x_outliers: jax.Array,   # bf16 (m, k)     outlier activation channels
    qweight: jax.Array,      # int8 (in, out)  quantized weight
    scale_col: jax.Array,    # f32  (out,)     per-out-channel weight scales
    fp_weight: jax.Array,    # bf16 (k, out)   outlier weight rows
    silu: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """The MixQ prefill GEMM: int8 MXU matmul with dequant epilogue plus the
    fp16 outlier side-GEMM accumulated in, optional fused SiLU.

    Math (reference TsinghuaMixQPlugin.cpp:518-532 + CUTLASS
    LinearCombinationDequant epilogue linear_combination_dequant.h:120-160):
        Out = silu?( (q_x @ qweight) * scale_row[:,None] * scale_col[None,:]
                     + x_outliers @ fp_weight )
    """
    acc = jax.lax.dot_general(
        q_x, qweight,
        dimension_numbers=(((q_x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc = acc * scale_row[..., None] * scale_col[None, :]
    side = jnp.dot(x_outliers.astype(jnp.float32),
                   fp_weight.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    out = acc + side
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(out_dtype)


def mix_linear(x: jax.Array, qweight: jax.Array, scale_col: jax.Array,
               fp_ind: jax.Array, fp_weight: jax.Array,
               silu: bool = False, out_dtype=jnp.bfloat16) -> jax.Array:
    """Whole unfused mixed linear from float activations (testing helper)."""
    q_x, scale_row, x_out = quant_split(x, fp_ind)
    return mixed_matmul(q_x, scale_row, x_out, qweight, scale_col, fp_weight,
                        silu=silu, out_dtype=out_dtype)


def lr_linear(x: jax.Array, qweight: jax.Array, scale_col: jax.Array,
              u: jax.Array, v: jax.Array,
              out_dtype=jnp.bfloat16) -> jax.Array:
    """W8A8 + rank-r correction (QuantAlgo.INT8_LR):
        Out = (q(x) @ qweight) * s_row * s_col + (x @ u) @ v
    The correction repairs the weight-quantization residual with two
    dense MXU GEMMs — no outlier gather, no calibration artifact."""
    from ..quant import core as qcore
    q_x, s_row = qcore.quantize_activations(x)
    acc = jax.lax.dot_general(
        q_x, qweight, (((q_x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    acc = acc * s_row[..., None] * scale_col[None, :]
    corr = jnp.dot(jnp.dot(x.astype(jnp.bfloat16), u,
                           preferred_element_type=jnp.float32)
                   .astype(jnp.bfloat16), v,
                   preferred_element_type=jnp.float32)
    return (acc + corr).astype(out_dtype)


def wo_matmul(
    x: jax.Array,            # bf16 (m, in)
    qweight: jax.Array,      # int8 (in, out) — int4 values held in int8 ok
    scale_col: jax.Array,    # f32  (out,)
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Weight-only W8A16/W4A16 matmul: dequantize weight, bf16 MXU matmul.

    Decode path replacement for fpA_intB_gemm / weightOnlyBatchedGemv
    (weightonlykernel/fpA_intB_gemm_wrapper.cu:28-66). On TPU this regime is
    HBM-bandwidth-bound on the int8 weight read; the Pallas version
    dequantizes in VMEM so HBM traffic is 1 byte/weight.
    """
    w = qweight.astype(jnp.bfloat16)
    acc = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    return (acc * scale_col[None, :]).astype(out_dtype)


def wo_matmul_grouped(
    x: jax.Array,            # bf16 (m, in)
    qweight: jax.Array,      # int8-held int4 (in, out)
    scale_g: jax.Array,      # f32  (in/G, out) per-group scales
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Group-wise W4A16 matmul (QuantAlgo.W4A16_G, stock TRT-LLM
    W4A16_GPTQ grouping): per-group partial dots batched over the group
    axis on the MXU, scales applied to the f32 partials — the (in, out)
    dequantized weight is never materialized in HBM. int4 values are
    exact in bf16 so the partial dot loses nothing."""
    m, k = x.shape
    g, n = scale_g.shape
    gs = k // g
    xg = x.astype(jnp.bfloat16).reshape(m, g, gs)
    qg = qweight.astype(jnp.bfloat16).reshape(g, gs, n)
    part = jnp.einsum("mgk,gkn->gmn", xg, qg,
                      preferred_element_type=jnp.float32)
    out = jnp.einsum("gmn,gn->mn", part, scale_g.astype(jnp.float32))
    return out.astype(out_dtype)


def attention(
    q: jax.Array,            # (b, sq, hq, d)
    k: jax.Array,            # (b, skv, hkv, d)
    v: jax.Array,            # (b, skv, hkv, d)
    mask: Optional[jax.Array] = None,   # broadcastable to (b, hq, sq, skv), True = keep
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,   # additive logits bias (ALiBi), same broadcast
    softcap: float = 0.0,               # tanh logit softcapping (Gemma-2)
) -> jax.Array:
    """Reference multi-head attention with GQA (hq % hkv == 0), f32 softmax.

    GQA contracts GROUPED — q reshaped (b, sq, hkv, g, d) against the
    un-repeated kv — so no (b, skv, hq, d) repeated copy is ever
    materialized (the repeat cost g x the KV footprint at exactly the
    prefill sizes that matter; VERDICT r1 weak #4)."""
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    scale = scale if scale is not None else d ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    qg = qf.reshape(b, sq, hkv, groups, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, kf)
    if bias is not None or mask is not None or softcap:
        # broadcast helpers arrive shaped for (b, hq, sq, skv)
        logits = logits.reshape(b, hq, sq, -1)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        if softcap:
            # Gemma-2 attn_logit_softcapping (HF Gemma2Attention eager)
            logits = jnp.tanh(logits / softcap) * softcap
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        logits = logits.reshape(b, hkv, groups, sq, -1)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vf)
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def attention_int8kv(
    q: jax.Array,            # (b, sq, hq, d)
    k_q: jax.Array,          # (b, skv, hkv, d) int8
    k_s: jax.Array,          # (b, skv, hkv) f32 per-(token, head) scales
    v_q: jax.Array,          # (b, skv, hkv, d) int8
    v_s: jax.Array,          # (b, skv, hkv) f32
    mask: Optional[jax.Array] = None,   # broadcastable to (b, hq, sq, skv)
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    softcap: float = 0.0,
) -> jax.Array:
    """Attention straight over the int8 KV cache — no dequantized copy.

    The per-(token, head) scales factor out of both contractions:
      logits = (q · k_int8) * k_scale      (scale applied to LOGITS)
      out    = (probs * v_scale) · v_int8  (scale folded into PROBS)
    so the (B, S, H, D)-sized dequantized cache the naive path materializes
    every decode step (round-1 weak item 6) never exists; GQA is handled by
    grouping q heads instead of repeating K/V. Also slightly MORE accurate
    than dequantize->bf16->attend: products accumulate in f32 off the raw
    int8 values.
    """
    b, sq, hq, d = q.shape
    hkv = k_q.shape[2]
    g = hq // hkv
    scale = scale if scale is not None else d ** -0.5
    q5 = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, g, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", q5, k_q.astype(jnp.float32))
    logits = logits * k_s.transpose(0, 2, 1)[:, :, None, None, :]
    if bias is not None:
        bias = jnp.broadcast_to(bias, (bias.shape[0], hq) + bias.shape[2:])
        logits = logits + bias.reshape(
            bias.shape[0], hkv, g, *bias.shape[2:]).astype(jnp.float32)
    if softcap:
        # applied to the full (dequantized) logits, before masking — same
        # order as attention() above (r2 VERDICT weak #1: this path took
        # the parameter and silently dropped it)
        logits = jnp.tanh(logits / softcap) * softcap
    if mask is not None:
        mask = jnp.broadcast_to(mask, (mask.shape[0], hq) + mask.shape[2:])
        mask = mask.reshape(mask.shape[0], hkv, g, *mask.shape[2:])
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs * v_s.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v_q.astype(jnp.float32))
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def attention_stats(
    q: jax.Array,            # (b, sq, hq, d)
    k: jax.Array,            # (b, skv, hkv, d) float OR int8
    v: jax.Array,            # (b, skv, hkv, d)
    k_s: Optional[jax.Array] = None,   # (b, skv, hkv) f32 when k/v are int8
    v_s: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,  # broadcastable to (b, hq, sq, skv)
    scale: Optional[float] = None,
    softcap: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """attention()/attention_int8kv() that ALSO returns the softmax running
    stats: (out (b, sq, hq, d), m (b, hq, sq), l (b, hq, sq)) with
    out = exp(logits - m) @ v / l. Lets callers merge exactly with
    attention over KV held elsewhere (merge_attention_stats) — the jnp
    ground truth for the paged decode kernel's stats mode (beam-burst
    dense tails, flash-decoding page splits)."""
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    scale = scale if scale is not None else d ** -0.5
    q5 = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, g, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", q5, k.astype(jnp.float32))
    if k_s is not None:
        logits = logits * k_s.transpose(0, 2, 1)[:, :, None, None, :]
    if softcap:
        logits = jnp.tanh(logits / softcap) * softcap
    if mask is not None:
        mask = jnp.broadcast_to(mask, (b, hq, sq, k.shape[1]))
        logits = jnp.where(mask.reshape(b, hkv, g, sq, -1), logits, -1e30)
    m = jnp.max(logits, axis=-1)                       # (b, hkv, g, sq)
    p = jnp.exp(logits - jnp.maximum(m[..., None], -0.5e30))
    l = jnp.sum(p, axis=-1)
    if v_s is not None:
        p = p * v_s.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p, v.astype(jnp.float32))
    out = out / jnp.maximum(l, 1e-20).transpose(0, 3, 1, 2)[..., None]
    # out stays FLOAT32: parts are merged in f32 and cast once at the end —
    # rounding each part to bf16 first costs ~1e-2 relative vs the
    # single-softmax reference (measured: flipped beam choices)
    return (out.reshape(b, sq, hq, d),
            m.reshape(b, hq, sq), l.reshape(b, hq, sq))


def merge_attention_stats(parts) -> jax.Array:
    """Exactly combine attention results computed over DISJOINT KV sets.

    parts: sequence of (out (b, sq, hq, d) NORMALIZED, m (b, hq, sq),
    l (b, hq, sq)). Standard online-softmax merge: with acc_i = out_i*l_i,
    out = sum_i acc_i * e^(m_i - M) / sum_i l_i * e^(m_i - M). Fully-empty
    parts (m = -inf, l = 0) contribute nothing."""
    ms = jnp.stack([m for _, m, _ in parts])           # (P, b, hq, sq)
    big = jnp.max(ms, axis=0)
    big = jnp.maximum(big, -0.5e30)                    # all-empty rows
    denom = jnp.zeros_like(big)
    num = None
    for out, m, l in parts:
        w = (l * jnp.exp(m - big)).astype(jnp.float32)    # (b, hq, sq)
        denom = denom + w
        t = out.astype(jnp.float32) * w.transpose(0, 2, 1)[..., None]
        num = t if num is None else num + t
    denom = jnp.maximum(denom, 1e-20).transpose(0, 2, 1)[..., None]
    return num / denom   # f32; callers cast once
