"""Quantized linear dispatch: params dict + algo -> forward.

This is the TPU-native replacement for the reference's layer swapping
(tensorrt_llm/quantization/quantize.py:307-349 mix_quantize_ootb swapping
Linears for MixQLinear; MixQ/src/mixquant/modules/linear.py MixLinear_GEMM
dispatch). There is no module surgery: a linear is just a params dict whose
schema encodes its quantization, and this module picks the compute path at
trace time.

Param schemas (weights in (in, out) "kernel" layout):
  NONE:      {"w": bf16 (in, out)} [+ "b"]
  W8A16:     {"qweight": int8 (in, out), "scale_col": f32 (out,)} [+ "b"]
  W4A16:     same, qweight holds int4 values in int8 (or packed uint8 "qweight_packed")
  W4A16_G:   {"qweight": int4-in-int8 (in, out), "scale_g": f32 (in/G, out)}
  INT8_MIX:  {"qweight", "scale_col", "fp_ind": int32 (k,),
              "fp_weight": bf16 (k, out)} [+ "b"]
  INT4_MIX:  same with int4-valued qweight

Backend: "ref" (the default) composes XLA dots; "pallas" forces the
full-Pallas kernels (kept for comparison and for other TPU generations).
See default_backend() for the measurements behind the default.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.config import QuantAlgo
from ..quant import core as qcore
from . import ref


@functools.cache
def default_backend() -> str:
    """Backend for the *linear* ops (matmuls + their quant epilogues).

    Measured on the target chip (tools/kernel_bench.py + probes): XLA's
    native dots reach 305-425 TFLOPS/TOPS at model shapes while
    Mosaic-generated matmul loops cap near 130, and Pallas DMA tops out at
    ~310 GB/s vs 575 for XLA fusions — so the XLA-composed reference path
    is the production default everywhere XLA can fuse. Pallas remains the
    engine for the ops XLA cannot express efficiently: flash prefill
    attention and paged decode attention with in-kernel int8 KV dequant
    (dispatched in ops/attention.py and models/common.py, not here).
    Override with MIXQ_BACKEND=pallas|ref.
    """
    forced = os.environ.get("MIXQ_BACKEND")
    if forced:
        return forced
    return "ref"


@functools.cache
def _pallas_available() -> bool:
    try:
        from . import mixed_matmul, wo_matmul  # noqa: F401
        return True
    except ImportError:
        return False


def _maybe_bias(out: jax.Array, params: dict) -> jax.Array:
    b = params.get("b")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def norm_linear(params: dict, x: jax.Array, algo: QuantAlgo,
                norm_w: jax.Array, eps: float = 1e-6,
                backend: Optional[str] = None) -> jax.Array:
    """RMSNorm -> linear, fused into one kernel pass on the mix path.

    This is the reference's FasterTransformerRMSNorm + MixLinear pairing
    (MixQ fused/norm.py:6-39 keyed on next_layer.ind): on TPU the fused
    Pallas rmsnorm_quant_split feeds the mixed GEMM directly, so the normed
    activations never round-trip to HBM in bf16.
    """
    backend = backend or default_backend()
    if algo.is_mix and backend == "pallas":
        from . import norm_quant as nq
        from . import mixed_matmul as mk
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        q_x, srow, xout = nq.rmsnorm_quant_split(x2, norm_w, params["fp_ind"],
                                                 eps=eps)
        out = mk.mixed_matmul(q_x, srow, xout, _unpacked_qweight(params),
                              params["scale_col"], params["fp_weight"],
                              out_dtype=x.dtype)
        return _maybe_bias(out, params).reshape(*lead, -1)
    h = ref.rmsnorm(x, norm_w, eps)
    return linear(params, h, algo, backend)


def linear(params: dict, x: jax.Array, algo: QuantAlgo,
           backend: Optional[str] = None) -> jax.Array:
    """Apply a (possibly quantized) linear. x: (..., in) -> (..., out)."""
    backend = backend or default_backend()
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])

    if algo == QuantAlgo.NONE:
        w = params["w"]
        out = jnp.dot(x2.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32).astype(x.dtype)
    elif algo.is_fp8:
        # weight-only fp8: dequant fuses into the dot (1 byte/weight HBM
        # traffic, same as int8 weight-only; reference stock FP8 algo)
        w = (params["qweight"].astype(jnp.float32)
             * params["scale_col"][None, :]).astype(jnp.bfloat16)
        out = jnp.dot(x2.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    elif algo.is_lr:
        out = ref.lr_linear(x2, params["qweight"], params["scale_col"],
                            params["lr_u"], params["lr_v"],
                            out_dtype=x.dtype)
    elif algo == QuantAlgo.W4A16_G:
        scale_g = params["scale_g"]
        gs = x2.shape[-1] // scale_g.shape[0]
        if ("qweight_packed" in params and _packed_kernel_ok(x2.shape[0])
                and gs % 128 == 0):
            # decode regime: packed-int4 kernel with group scales in VMEM
            from . import wo_matmul as wk
            out = wk.wo_matmul_packed_grouped(
                x2, params["qweight_packed"], scale_g, gs,
                out_dtype=x.dtype)
        else:
            out = ref.wo_matmul_grouped(x2, _unpacked_qweight(params),
                                        scale_g, out_dtype=x.dtype)
    elif algo.is_weight_only:
        if "qweight_packed" in params and _packed_kernel_ok(x2.shape[0]):
            # decode regime with packed int4: the Pallas kernel reads the
            # packed tensor directly (0.5 bytes/weight HBM traffic) and
            # splits nibbles in VMEM — reference dequantize_s4_to_fp16x2
            # (kernel/i8gemm.cu:306-369). Prefill (large M) stays on the
            # XLA dot, which is compute- not bandwidth-bound there.
            from . import wo_matmul as wk
            out = wk.wo_matmul_packed(x2, params["qweight_packed"],
                                      params["scale_col"], out_dtype=x.dtype)
        else:
            qw = _unpacked_qweight(params)
            if backend == "pallas":
                from . import wo_matmul as wk
                out = wk.wo_matmul(x2, qw, params["scale_col"],
                                   out_dtype=x.dtype)
            else:
                out = ref.wo_matmul(x2, qw, params["scale_col"],
                                    out_dtype=x.dtype)
    elif algo.is_mix:
        if backend == "pallas":
            qw = _unpacked_qweight(params)
            from . import mixed_matmul as mk
            out = mk.mix_linear(x2, qw, params["scale_col"], params["fp_ind"],
                                params["fp_weight"], out_dtype=x.dtype)
        else:
            # NOTE: per-shape hybrid (XLA dot + Pallas epilogue) schedules
            # beat all-XLA in *isolated* kernel probes (~10%/shape) but
            # made zero difference in the full model step — XLA overlaps
            # the epilogue with neighboring ops. Keep the simple path.
            qw = _unpacked_qweight(params)
            out = ref.mix_linear(x2, qw, params["scale_col"],
                                 params["fp_ind"], params["fp_weight"],
                                 out_dtype=x.dtype)
    else:
        raise ValueError(f"unknown algo {algo}")

    return _maybe_bias(out, params).reshape(*lead, -1)


def _packed_kernel_ok(m: int) -> bool:
    """Route packed int4 through the Pallas kernel only in the
    bandwidth-bound small-M regime (trace-time static), on real TPU, with
    MXU-aligned shapes. Threshold overridable for tuning."""
    from ._util import _on_tpu
    limit = int(os.environ.get("MIXQ_PACKED_M_MAX", "128"))
    return _on_tpu() and m <= limit


def _unpacked_qweight(params: dict) -> jax.Array:
    if "qweight_packed" in params:
        return qcore.unpack_int4(params["qweight_packed"])
    return params["qweight"]


def quantize_linear_params(w: jax.Array, algo: QuantAlgo,
                           act_scale: Optional[jax.Array] = None,
                           num_outliers: int = 128,
                           bias: Optional[jax.Array] = None,
                           pack: Optional[bool] = None,
                           group_size: int = 128) -> dict:
    """Build the params dict for one linear from a float weight (in, out).

    pack: store int4 weights two-per-byte (quant.core.pack_int4). Default
    ON for int4 algos with an even in-dim — int4's entire capacity story
    (the BASELINE Llama-2-13B W4A16 config: ~6.5 GB weights on a 16 GB
    chip) depends on it, and every consumer handles the packed form (the
    packed Pallas decode kernels read nibbles in VMEM; other regimes
    unpack in-graph, a fused transient). pack=False keeps the int8
    container (debug/interop).
    """
    if pack is None:
        pack = w.shape[0] % 2 == 0
    out: dict = {}
    if algo == QuantAlgo.NONE:
        out["w"] = w.astype(jnp.bfloat16)
    elif algo == QuantAlgo.W8A16:
        q, s = qcore.quantize_weight_int8(w)
        out["qweight"], out["scale_col"] = q, s.astype(jnp.float32)
    elif algo == QuantAlgo.FP8:
        q, s = qcore.quantize_weight_fp8(w)
        out["qweight"], out["scale_col"] = q, s.astype(jnp.float32)
    elif algo == QuantAlgo.INT8_LR:
        q, s, u, v = qcore.make_lr_artifact(w)
        out["qweight"], out["scale_col"] = q, s
        out["lr_u"], out["lr_v"] = u, v
    elif algo == QuantAlgo.W4A16:
        q, s = qcore.quantize_weight_int4(w)
        if pack:
            out["qweight_packed"] = qcore.pack_int4(q)
        else:
            out["qweight"] = q
        out["scale_col"] = s.astype(jnp.float32)
    elif algo == QuantAlgo.W4A16_G:
        q, s = qcore.quantize_weight_int4_grouped(w, group_size)
        if pack:
            out["qweight_packed"] = qcore.pack_int4(q)
        else:
            out["qweight"] = q
        out["scale_g"] = s.astype(jnp.float32)
    elif algo.is_mix:
        assert act_scale is not None, "mix quantization needs calibrated act_scale"
        art = qcore.make_mix_artifact(w, act_scale, num_outliers,
                                      bits=algo.weight_bits)
        if algo == QuantAlgo.INT4_MIX and pack:
            out["qweight_packed"] = qcore.pack_int4(art.qweight)
        else:
            out["qweight"] = art.qweight
        out["scale_col"] = art.scale_col
        out["fp_ind"] = art.fp_ind
        out["fp_weight"] = art.fp_weight
    else:
        raise ValueError(f"unknown algo {algo}")
    if bias is not None:
        out["b"] = bias.astype(jnp.bfloat16)
    return out
