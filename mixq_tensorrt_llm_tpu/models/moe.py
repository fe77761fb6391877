"""Mixture-of-Experts MLP (Mixtral family).

Reference parity: tensorrt_llm/layers/moe.py (697 LoC: top-k router with
renormalization, expert-parallel partitioning via moe_tp/moe_ep groups).
TPU re-design: experts are a stacked leading axis on the weight pytree
(E, in, out). Two dispatch strategies, both static-shaped:

  * RAGGED (default): tokens are replicated top_k ways, sorted by expert,
    and run through `jax.lax.ragged_dot` (the megablox grouped-matmul
    primitive) — each token only visits its k selected experts, so FLOPs
    are k/E of the dense form (4x saved for Mixtral top-2/8).
  * DENSE (fallback, MIXQ_MOE_RAGGED=0): one batched einsum per projection
    where every expert processes every token and router weights zero the
    rest; wasteful but trivially shardable (expert axis on the 'ep' mesh
    axis -> GSPMD expert parallelism with one psum), so the multi-chip EP
    path uses it under shard_map.

Quantization: each expert's gate_up/down weights carry the same
params-dict schema as dense linears (int8 + per-out-channel scales with a
stacked expert axis); the mixed-outlier path stays dense-MLP-only — the
reference routes MoE through weight-only as well.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..quant import core as qcore
from ..quant.config import QuantAlgo
from .common import ModelConfig


def router_probs(x: jax.Array, router_w: jax.Array, top_k: int,
                 norm_topk: bool = True):
    """x (B,S,H), router_w (H,E) -> weights (B,S,E), zero outside top-k.
    Mirrors the reference's RenormalizeMode (and HF norm_topk_prob):
    softmax over all experts, keep top-k, optionally renormalize the kept
    mass to 1 (Mixtral yes, Qwen2-MoE default no)."""
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                    # (B,S,E)
    top_vals, _ = jax.lax.top_k(probs, top_k)
    thresh = top_vals[..., -1:]
    keep = probs >= thresh
    kept = jnp.where(keep, probs, 0.0)
    if not norm_topk:
        return kept
    return kept / jnp.maximum(kept.sum(-1, keepdims=True), 1e-9)


def _expert_linear(params: Dict, x: jax.Array, algo: QuantAlgo) -> jax.Array:
    """Batched-over-experts linear: weights carry a leading E axis.

    x (E, T, in) -> (E, T, out). int8 weights are dequantized into the
    einsum (weight-only semantics; T is small per expert after routing in
    the ragged upgrade, dense here)."""
    out = jnp.einsum("eti,eio->eto", x.astype(jnp.bfloat16),
                     _dequant_stack(params),
                     preferred_element_type=jnp.float32)
    return out


def _use_ragged() -> bool:
    import os
    return os.environ.get("MIXQ_MOE_RAGGED", "1") != "0"


def _dequant_stack(params: Dict) -> jax.Array:
    """Expert-stacked weight (E, in, out) in bf16 (weight-only dequant;
    per-channel scale_col (E, out) or per-group scale_g (E, in/G, out))."""
    if "w" in params:
        return params["w"].astype(jnp.bfloat16)
    q = params["qweight"]
    if "scale_g" in params:
        e, k, n = q.shape
        g = params["scale_g"].shape[1]
        wg = (q.astype(jnp.float32).reshape(e, g, k // g, n)
              * params["scale_g"][:, :, None, :])
        return wg.reshape(e, k, n).astype(jnp.bfloat16)
    return (q.astype(jnp.float32)
            * params["scale_col"][:, None, :]).astype(jnp.bfloat16)


def moe_mlp(cfg: ModelConfig, moe_params: Dict, x: jax.Array,
            ragged: bool = None) -> jax.Array:
    """Full MoE block. x (B,S,H) -> (B,S,H).

    moe_params: {"router": {"w" (H,E)},
                 "gate_up": expert-stacked linear (E, H, 2I),
                 "down":    expert-stacked linear (E, I, H)}
    plus, for Qwen2-MoE (HF Qwen2MoeSparseMoeBlock shared_expert):
                {"shared_gate_up"/"shared_down": plain linear params,
                 "shared_gate": {"w" (H, 1)}} — an always-on dense expert
    whose output is sigmoid-gated and added to the routed mix.
    """
    from ..parallel import expert as ep_ctx
    if ep_ctx.active_ep() is not None:
        mesh, axis = ep_ctx.active_ep()
        out = ep_ctx.moe_mlp_ep(cfg, moe_params, x, mesh, axis=axis)
    else:
        if ragged is None:
            ragged = _use_ragged()
        out = (_moe_mlp_ragged if ragged
               else _moe_mlp_dense)(cfg, moe_params, x)
    if "shared_gate_up" in moe_params:
        from ..ops import dispatch
        algo = cfg.module_algo("gate_up_proj")
        if algo.is_mix:   # MoE family runs weight-only (reference routing)
            algo = (QuantAlgo.W8A16 if algo == QuantAlgo.INT8_MIX
                    else QuantAlgo.W4A16)
        gu = dispatch.linear(moe_params["shared_gate_up"], x, algo)
        gate, up = jnp.split(gu, 2, axis=-1)
        act = (jax.nn.silu(gate.astype(jnp.float32))
               * up.astype(jnp.float32)).astype(x.dtype)
        shared = dispatch.linear(moe_params["shared_down"], act, algo)
        g = jax.nn.sigmoid(jnp.dot(
            x.astype(jnp.float32),
            moe_params["shared_gate"]["w"].astype(jnp.float32)))  # (B,S,1)
        out = out + (g * shared.astype(jnp.float32)).astype(out.dtype)
    return out


def _moe_mlp_ragged(cfg: ModelConfig, moe_params: Dict,
                    x: jax.Array) -> jax.Array:
    """Grouped-matmul dispatch: sort token-expert pairs by expert, run
    ragged_dot over contiguous groups (reference MixtureOfExperts kernel
    dispatch, tensorrt_llm/layers/moe.py; megablox gmm on TPU)."""
    b, s, h = x.shape
    t = b * s
    e, k = cfg.num_experts, cfg.top_k_experts
    xf = x.reshape(t, h)

    logits = jnp.dot(xf.astype(jnp.float32),
                     moe_params["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                    # (T, E)
    top_vals, top_ids = jax.lax.top_k(probs, k)                # (T, k)
    if cfg.moe_norm_topk:
        top_vals = top_vals / jnp.maximum(top_vals.sum(-1, keepdims=True),
                                          1e-9)

    eid = top_ids.reshape(-1)                                  # (T*k,)
    order = jnp.argsort(eid)                                   # stable
    tok_idx = order // k                                       # source token
    xs = jnp.take(xf, tok_idx, axis=0).astype(jnp.bfloat16)    # (T*k, H)
    group_sizes = jnp.bincount(eid, length=e).astype(jnp.int32)

    gu = jax.lax.ragged_dot(xs, _dequant_stack(moe_params["gate_up"]),
                            group_sizes,
                            preferred_element_type=jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
    dn = jax.lax.ragged_dot(act, _dequant_stack(moe_params["down"]),
                            group_sizes,
                            preferred_element_type=jnp.float32)  # (T*k, H)

    wflat = jnp.take(top_vals.reshape(-1), order)              # (T*k,)
    out = jnp.zeros((t, h), jnp.float32).at[tok_idx].add(
        dn * wflat[:, None])
    return out.reshape(b, s, h).astype(x.dtype)


def _moe_mlp_dense(cfg: ModelConfig, moe_params: Dict,
                   x: jax.Array) -> jax.Array:
    b, s, h = x.shape
    e = cfg.num_experts
    weights = router_probs(x, moe_params["router"]["w"],
                           cfg.top_k_experts,
                           norm_topk=cfg.moe_norm_topk)     # (B,S,E)

    xt = jnp.broadcast_to(x.reshape(1, b * s, h), (e, b * s, h))
    algo = cfg.module_algo("gate_up_proj")
    if algo.is_mix:   # MoE experts run weight-only (reference routing)
        algo = (QuantAlgo.W8A16 if algo == QuantAlgo.INT8_MIX
                else QuantAlgo.W4A16)
    gu = _expert_linear(moe_params["gate_up"], xt, algo)    # (E,T,2I)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = jax.nn.silu(gate) * up
    down = _expert_linear(moe_params["down"], act.astype(jnp.bfloat16),
                          algo)                              # (E,T,H)
    mixed = jnp.einsum("eth,te->th", down,
                       weights.reshape(b * s, e).astype(jnp.float32))
    return mixed.reshape(b, s, h).astype(x.dtype)


def quantize_expert_linear(w_stack: jax.Array, algo: QuantAlgo,
                           group_size: int = 128) -> Dict:
    """w_stack (E, in, out) float -> expert-stacked params dict
    (W4A16_G: per-expert per-group scales, scale_g (E, in/G, out))."""
    if algo == QuantAlgo.NONE:
        return {"w": w_stack.astype(jnp.bfloat16)}
    bits = algo.weight_bits
    qs, ss = [], []
    for e in range(w_stack.shape[0]):
        if algo == QuantAlgo.W4A16_G:
            q, sc = qcore.quantize_weight_int4_grouped(w_stack[e],
                                                       group_size)
        elif bits == 8:
            q, sc = qcore.quantize_weight_int8(w_stack[e])
        else:
            q, sc = qcore.quantize_weight_int4(w_stack[e])
        qs.append(q)
        ss.append(sc.astype(jnp.float32))
    key = "scale_g" if algo == QuantAlgo.W4A16_G else "scale_col"
    return {"qweight": jnp.stack(qs), key: jnp.stack(ss)}
