"""Llama-family model: param construction, HF weight mapping, quantization.

Replaces the reference's tensorrt_llm/models/llama/{model.py,convert.py}
(from_hugging_face / quantize classmethods) and the MixQ PyTorch fusers
(MixQ/src/mixquant/models/llama.py LlamaFuser): q/k/v and gate/up are fused
into single GEMM weights at conversion time, and quantization is applied
per the QuantConfig routing (qkv/gate_up/o mix, down weight-only, lm_head
excluded — SURVEY §2.4).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.config import QuantAlgo, QuantConfig
from ..ops import dispatch
from .common import ModelConfig

# module name -> (uses bias when cfg.qkv_bias,)
LINEAR_MODULES = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")


def _t(w) -> jnp.ndarray:
    """HF torch (out, in) -> our (in, out) kernel layout."""
    return jnp.asarray(np.asarray(w)).T


def hf_layer_weights(hf: Mapping[str, np.ndarray], i: int, prefix: str = "model"
                     ) -> Dict[str, jnp.ndarray]:
    """Extract one decoder layer's float weights from an HF state dict.

    Works for Llama and Qwen2 (identical naming; Qwen2 adds qkv biases).
    Returns kernel-layout float weights keyed by our module names.
    """
    p = f"{prefix}.layers.{i}."
    out = {
        "qkv_proj": jnp.concatenate(
            [_t(hf[p + f"self_attn.{n}_proj.weight"]) for n in "qkv"], axis=1),
        "o_proj": _t(hf[p + "self_attn.o_proj.weight"]),
        "input_norm": jnp.asarray(np.asarray(hf[p + "input_layernorm.weight"])),
        "post_norm": jnp.asarray(
            np.asarray(hf[p + "post_attention_layernorm.weight"])),
    }
    if p + "block_sparse_moe.gate.weight" in hf:   # Mixtral MoE layer
        ne = 0
        while p + f"block_sparse_moe.experts.{ne}.w1.weight" in hf:
            ne += 1
        out["router_w"] = _t(hf[p + "block_sparse_moe.gate.weight"])
        out["experts_gate_up"] = jnp.stack([
            jnp.concatenate(
                [_t(hf[p + f"block_sparse_moe.experts.{e}.w1.weight"]),
                 _t(hf[p + f"block_sparse_moe.experts.{e}.w3.weight"])],
                axis=1)
            for e in range(ne)])
        out["experts_down"] = jnp.stack([
            _t(hf[p + f"block_sparse_moe.experts.{e}.w2.weight"])
            for e in range(ne)])
    else:
        out["gate_up_proj"] = jnp.concatenate(
            [_t(hf[p + "mlp.gate_proj.weight"]),
             _t(hf[p + "mlp.up_proj.weight"])], axis=1)
        out["down_proj"] = _t(hf[p + "mlp.down_proj.weight"])
    if p + "self_attn.q_proj.bias" in hf:
        out["qkv_bias"] = jnp.concatenate(
            [jnp.asarray(np.asarray(hf[p + f"self_attn.{n}_proj.bias"]))
             for n in "qkv"])
    return out


def act_scale_for(act_scales: Optional[Mapping[str, np.ndarray]], i: int,
                  module: str, in_features: int) -> jnp.ndarray:
    """Calibrated per-input-channel absmax for layer i's module.

    act_scales is keyed like the reference's calibration artifact
    (`model.layers.{i}.{hf_module}` — smooth_quant_get_act.py:13-50). The
    fused qkv / gate_up share one input, so q_proj / gate_proj scales apply.
    Falls back to ones (=> arbitrary but valid outlier choice) if missing.
    """
    hf_name = {
        "qkv_proj": "self_attn.q_proj",
        "o_proj": "self_attn.o_proj",
        "gate_up_proj": "mlp.gate_proj",
        "down_proj": "mlp.down_proj",
    }[module]
    if act_scales is not None:
        for key in (f"model.layers.{i}.{hf_name}", f"layers.{i}.{hf_name}"):
            if key in act_scales:
                return jnp.asarray(np.asarray(act_scales[key]), jnp.float32)
    return jnp.ones((in_features,), jnp.float32)


def _quantize_layer(cfg: ModelConfig, float_layer: Dict[str, jnp.ndarray],
                    act_scales, i: int) -> Dict:
    """Quantize one layer's float weights into the params-dict schema."""
    out: Dict = {
        "input_norm": {"w": float_layer["input_norm"].astype(jnp.float32)},
        "post_norm": {"w": float_layer["post_norm"].astype(jnp.float32)},
    }
    if cfg.num_experts > 0:
        from . import moe as moe_mod
        algo = cfg.module_algo("gate_up_proj")
        if algo.is_mix:  # experts run weight-only
            algo = (QuantAlgo.W8A16 if algo == QuantAlgo.INT8_MIX
                    else QuantAlgo.W4A16)
        out["moe"] = {
            "router": {"w": float_layer["router_w"].astype(jnp.bfloat16)},
            "gate_up": moe_mod.quantize_expert_linear(
                float_layer["experts_gate_up"], algo, cfg.quant.group_size),
            "down": moe_mod.quantize_expert_linear(
                float_layer["experts_down"], algo, cfg.quant.group_size),
        }
        mods = ("qkv_proj", "o_proj")
    else:
        mods = LINEAR_MODULES
    for mod in mods:
        w = float_layer[mod]
        algo = cfg.module_algo(mod)
        bias = float_layer.get("qkv_bias") if mod == "qkv_proj" else None
        scale = act_scale_for(act_scales, i, mod, w.shape[0]) \
            if algo.is_mix else None
        out[mod] = dispatch.quantize_linear_params(
            w, algo, act_scale=scale, num_outliers=cfg.quant.num_outliers,
            group_size=cfg.quant.group_size, bias=bias)
    return out


def stack_layers(layer_dicts) -> Dict:
    """List of per-layer param dicts -> one dict stacked on axis 0.

    Built incrementally with buffer donation so peak device memory is
    (stacked + one layer), not 2x stacked — at 7B the naive jnp.stack
    doubles a ~7 GB weight set and OOMs a 16 GB chip during init.
    """
    import functools

    n = len(layer_dicts)
    first = layer_dicts[0]

    stacked = jax.tree.map(
        lambda leaf: jnp.zeros((n,) + jnp.shape(leaf),
                               jnp.asarray(leaf).dtype), first)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _set(stacked, layer, i):
        return jax.tree.map(lambda s, l: s.at[i].set(l), stacked, layer)

    for i, layer in enumerate(layer_dicts):
        stacked = _set(stacked, layer, i)
    return stacked


def params_from_hf(cfg: ModelConfig, hf: Mapping[str, np.ndarray],
                   act_scales: Optional[Mapping[str, np.ndarray]] = None,
                   prefix: str = "model") -> Dict:
    """Full HF state dict -> quantized params pytree."""
    layers = []
    for i in range(cfg.num_layers):
        fl = hf_layer_weights(hf, i, prefix)
        layers.append(_quantize_layer(cfg, fl, act_scales, i))
    params: Dict = {
        "embed": {"w": jnp.asarray(
            np.asarray(hf[f"{prefix}.embed_tokens.weight"])).astype(cfg.dtype)},
        "layers": stack_layers(layers),
        "final_norm": {"w": jnp.asarray(
            np.asarray(hf[f"{prefix}.norm.weight"])).astype(jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": _t(hf["lm_head.weight"]).astype(cfg.dtype)}
    return params


def init_random_params(cfg: ModelConfig, key: jax.Array,
                       act_scales=None) -> Dict:
    """Random-weight params (for benchmarks and tests). Applies the same
    quantization routing as a real checkpoint so the compute path is
    identical to production."""
    n_keys = cfg.num_layers + 3
    keys = jax.random.split(key, n_keys)
    std = 0.02

    def rnd(k, *shape):
        return jax.random.normal(k, shape, jnp.float32) * std

    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], 4)
        fl = {
            "qkv_proj": rnd(lk[0], cfg.hidden_size, cfg.qkv_out),
            "o_proj": rnd(lk[1], cfg.q_size, cfg.hidden_size),
            "gate_up_proj": rnd(lk[2], cfg.hidden_size,
                                2 * cfg.intermediate_size),
            "down_proj": rnd(lk[3], cfg.intermediate_size, cfg.hidden_size),
            "input_norm": jnp.ones((cfg.hidden_size,), jnp.float32),
            "post_norm": jnp.ones((cfg.hidden_size,), jnp.float32),
        }
        if cfg.qkv_bias:
            fl["qkv_bias"] = jnp.zeros((cfg.qkv_out,), jnp.float32)
        if cfg.num_experts > 0:
            ek = jax.random.split(lk[2], cfg.num_experts + 1)
            fl["router_w"] = rnd(ek[0], cfg.hidden_size, cfg.num_experts)
            fl["experts_gate_up"] = jnp.stack([
                rnd(ek[1 + e], cfg.hidden_size, 2 * cfg.intermediate_size)
                for e in range(cfg.num_experts)])
            fl["experts_down"] = jnp.stack([
                rnd(jax.random.fold_in(ek[1 + e], 1), cfg.intermediate_size,
                    cfg.hidden_size)
                for e in range(cfg.num_experts)])
            del fl["gate_up_proj"], fl["down_proj"]
        layers.append(_quantize_layer(cfg, fl, act_scales, i))

    params: Dict = {
        "embed": {"w": rnd(keys[-3], cfg.vocab_size,
                           cfg.hidden_size).astype(cfg.dtype)},
        "layers": stack_layers(layers),
        "final_norm": {"w": jnp.ones((cfg.hidden_size,), jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {
            "w": rnd(keys[-2], cfg.hidden_size, cfg.vocab_size
                     ).astype(cfg.dtype)}
    return params


def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()) -> ModelConfig:
    """transformers LlamaConfig/Qwen2Config -> ModelConfig."""
    mt = hf_config.model_type.lower()
    arch = "qwen2" if "qwen2" in mt else ("mixtral" if "mixtral" in mt
                                          else "llama")
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads)
    return ModelConfig(
        arch=arch,
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads",
                             hf_config.num_attention_heads),
        head_dim=head_dim,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_norm_eps=hf_config.rms_norm_eps,
        max_position_embeddings=hf_config.max_position_embeddings,
        qkv_bias=(arch == "qwen2"),
        sliding_window=getattr(hf_config, "sliding_window", None) or 0,
        num_experts=getattr(hf_config, "num_local_experts", 0) or 0,
        top_k_experts=getattr(hf_config, "num_experts_per_tok", 2) or 2,
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        quant=quant,
        **_rope_scaling_axes(hf_config),
    )


def _rope_scaling_axes(hf_config) -> dict:
    """HF rope_scaling dict -> ModelConfig axes (Llama-3.1 'llama3'
    wavelength-banded scaling and plain 'linear' interpolation)."""
    rs = getattr(hf_config, "rope_scaling", None)
    if not rs:
        return {}
    kind = rs.get("rope_type", rs.get("type", "none"))
    if kind == "default":
        return {}
    if kind not in ("llama3", "linear", "yarn"):
        raise NotImplementedError(f"rope_scaling type {kind!r} unsupported "
                                  "(llama3, linear, and yarn are)")
    out = {"rope_scaling_type": kind,
           "rope_scaling_factor": float(rs.get("factor", 1.0))}
    if kind == "llama3":
        out.update(
            rope_low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            rope_high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            rope_original_max_pos=int(
                rs.get("original_max_position_embeddings", 8192)))
    if kind == "yarn":
        import math
        factor = float(rs.get("factor", 1.0))
        af = rs.get("attention_factor")
        mscale, mall = rs.get("mscale"), rs.get("mscale_all_dim")

        def get_mscale(scale, m=1):
            return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0
        if af is None:
            af = (get_mscale(factor, mscale) / get_mscale(factor, mall)
                  if mscale and mall else get_mscale(factor))
        out.update(
            rope_beta_fast=float(rs.get("beta_fast") or 32),
            rope_beta_slow=float(rs.get("beta_slow") or 1),
            rope_attention_factor=float(af),
            rope_original_max_pos=int(
                rs.get("original_max_position_embeddings")
                or hf_config.max_position_embeddings))
    return out
