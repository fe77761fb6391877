"""Requantize a float params pytree under a new QuantConfig.

The HF pipeline (hf.py) quantizes straight from a state dict; this module
covers the other direction the reference supports through its quantize
classmethods (MixQ/src/mixquant/quantizer.py applied to an in-memory
model): take an unquantized (QuantAlgo.NONE) params tree — e.g. one
produced by training, LoRA merging, or load_checkpoint of a float export —
and emit the quantized tree + config. This is what the accuracy gate uses
to compare float vs int8_mix vs int4_mix on identical weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as mllama
from ..models.common import ModelConfig
from ..quant.config import QuantConfig


def _unstack_float_layer(layers: Dict, i: int, cfg: ModelConfig) -> Dict:
    """Stacked float layer params -> the raw-weight dict _quantize_layer
    expects (module name -> (in, out) array)."""
    fl: Dict = {
        "input_norm": layers["input_norm"]["w"][i],
        "post_norm": layers["post_norm"]["w"][i],
    }
    if cfg.num_experts > 0:
        moe = layers["moe"]
        fl["router_w"] = moe["router"]["w"][i]
        fl["experts_gate_up"] = moe["gate_up"]["w"][i]
        fl["experts_down"] = moe["down"]["w"][i]
        mods = ("qkv_proj", "o_proj")
    else:
        mods = mllama.LINEAR_MODULES
    for mod in mods:
        p = layers[mod]
        assert "w" in p, (
            f"requantize needs a float tree; {mod} has keys {list(p)}")
        fl[mod] = p["w"][i]
        if mod == "qkv_proj" and p.get("b") is not None:
            fl["qkv_bias"] = p["b"][i]
    return fl


def requantize(params_float: Dict, cfg_float: ModelConfig,
               quant: QuantConfig,
               act_scales: Optional[Mapping[str, np.ndarray]] = None
               ) -> tuple[Dict, ModelConfig]:
    """Float params + target QuantConfig -> (quantized params, new cfg)."""
    assert not cfg_float.quant.enabled, "params_float must be unquantized"
    cfg_q = dataclasses.replace(cfg_float, quant=quant)
    layers_f = params_float["layers"]
    layers = [
        mllama._quantize_layer(cfg_q, _unstack_float_layer(layers_f, i, cfg_q),
                               act_scales, i)
        for i in range(cfg_q.num_layers)
    ]
    out: Dict = {
        "embed": {"w": params_float["embed"]["w"].astype(cfg_q.dtype)},
        "layers": mllama.stack_layers(layers),
        "final_norm": {"w": params_float["final_norm"]["w"]
                       .astype(jnp.float32)},
    }
    if "lm_head" in params_float:
        out["lm_head"] = {
            "w": params_float["lm_head"]["w"].astype(cfg_q.dtype)}
    return out, cfg_q
