"""Mixture-of-Experts MLP (Mixtral family).

Reference parity: tensorrt_llm/layers/moe.py (697 LoC: top-k router with
renormalization, expert-parallel partitioning via moe_tp/moe_ep groups).
TPU re-design: experts are a stacked leading axis on the weight pytree
(E, in, out) so the whole MoE block is one batched einsum per projection —
dense dispatch. Every expert processes every token and the router weights
zero out non-selected pairs; for the E<=8, top-2 configs of the Mixtral
line this wastes E/k compute but keeps shapes static, fuses on the MXU,
and shards cleanly (put the expert axis on the 'ep'/'tp' mesh axis and
GSPMD turns it into expert parallelism with one psum). A ragged gmm
(megablox) dispatch is the round-2 upgrade for large E.

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


def router_probs(x: jax.Array, router_w: jax.Array, top_k: int):
    """x (B,S,H), router_w (H,E) -> (weights (B,S,E) sparse-renormalized,
    selected mask). Mirrors the reference's RenormalizeMode: softmax over
    all experts, keep top-k, renormalize the kept mass to 1."""
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                    # (B,S,E)
    top_vals, _ = jax.lax.top_k(probs, top_k)
    thresh = top_vals[..., -1:]
    keep = probs >= thresh
    kept = jnp.where(keep, probs, 0.0)
    return kept / jnp.maximum(kept.sum(-1, keepdims=True), 1e-9)


def _expert_linear(params: Dict, x: jax.Array, algo: QuantAlgo) -> jax.Array:
    """Batched-over-experts linear: weights carry a leading E axis.

    x (E, T, in) -> (E, T, out). int8 weights are dequantized into the
    einsum (weight-only semantics; T is small per expert after routing in
    the ragged upgrade, dense here)."""
    if algo == QuantAlgo.NONE:
        w = params["w"].astype(jnp.bfloat16)
    else:
        qw = params["qweight"]
        w = (qw.astype(jnp.float32)
             * params["scale_col"][:, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum("eti,eio->eto", x.astype(jnp.bfloat16), w,
                     preferred_element_type=jnp.float32)
    return out


def moe_mlp(cfg: ModelConfig, moe_params: Dict, x: jax.Array) -> jax.Array:
    """Full MoE block. x (B,S,H) -> (B,S,H).

    moe_params: {"router": {"w" (H,E)},
                 "gate_up": expert-stacked linear (E, H, 2I),
                 "down":    expert-stacked linear (E, I, H)}
    """
    b, s, h = x.shape
    e = cfg.num_experts
    weights = router_probs(x, moe_params["router"]["w"],
                           cfg.top_k_experts)               # (B,S,E)

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


def quantize_expert_linear(w_stack: jax.Array, algo: QuantAlgo) -> Dict:
    """w_stack (E, in, out) float -> expert-stacked params dict."""
    if algo == QuantAlgo.NONE:
        return {"w": w_stack.astype(jnp.bfloat16)}
    bits = algo.weight_bits
    qs, ss = [], []
    for e in range(w_stack.shape[0]):
        if bits == 8:
            q, sc = qcore.quantize_weight_int8(w_stack[e])
        else:
            q, sc = qcore.quantize_weight_int4(w_stack[e])
        qs.append(q)
        ss.append(sc.astype(jnp.float32))
    return {"qweight": jnp.stack(qs), "scale_col": jnp.stack(ss)}
