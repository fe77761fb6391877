"""Checkpoint save/load: config.json + model.safetensors.

TPU-native analogue of the reference's two-file checkpoint
(tensorrt_llm/models/modeling_utils.py:512-522 save_checkpoint /
:445 load with required-name validation — config.json + rank{i}.safetensors).
Divergences (SURVEY §2.4 "quirks the TPU build must NOT copy"): tensors are
stored in their real dtypes (int8/int32/bf16) instead of fp16-viewed bit
packing, and there is one logical checkpoint instead of per-rank shards —
resharding is GSPMD's job at load time, not the exporter's.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.common import ModelConfig
from ..quant.config import QuantAlgo

CONFIG_NAME = "config.json"
WEIGHTS_NAME = "model.safetensors"


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, jax.Array]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, jax.Array]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path: str, params: Dict, cfg: ModelConfig) -> None:
    import safetensors.flax
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, CONFIG_NAME), "w") as f:
        json.dump(cfg.to_dict(), f, indent=2)
    flat = {}
    for k, v in _flatten(params).items():
        v = jnp.asarray(v)
        if v.dtype == jnp.float8_e4m3fn:
            # safetensors' flax writer routes through numpy, which has no
            # float8; store the raw bytes with a dtype-marker suffix
            k, v = k + "@e4m3", jax.lax.bitcast_convert_type(v, jnp.uint8)
        flat[k] = v
    safetensors.flax.save_file(flat, os.path.join(path, WEIGHTS_NAME))


def load_checkpoint(path: str) -> Tuple[Dict, ModelConfig]:
    import safetensors.flax
    with open(os.path.join(path, CONFIG_NAME)) as f:
        cfg = ModelConfig.from_dict(json.load(f))
    flat = {}
    for k, v in safetensors.flax.load_file(
            os.path.join(path, WEIGHTS_NAME)).items():
        if k.endswith("@e4m3"):
            k = k[:-len("@e4m3")]
            v = jax.lax.bitcast_convert_type(v, jnp.float8_e4m3fn)
        flat[k] = v
    params = _unflatten(flat)
    _validate(params, cfg)
    return params, cfg


def _validate(params: Dict, cfg: ModelConfig) -> None:
    """Required-name validation (reference modeling_utils.py:445-496)."""
    missing = []
    if "embed" not in params:
        missing.append("embed")
    if "final_norm" not in params:
        missing.append("final_norm")
    if not cfg.tie_word_embeddings and "lm_head" not in params:
        missing.append("lm_head")
    layers = params.get("layers", {})
    if cfg.arch == "recurrentgemma":
        for grp, mods in (("per_pos", ("temporal_norm", "channel_norm",
                                       "gate_up_proj", "down_proj")),
                          ("att", ("qkv_proj", "o_proj")),
                          ("rec", ("linear_x", "linear_y", "linear_out",
                                   "conv_w", "recurrent_param"))):
            for mod in mods:
                if mod not in params.get(grp, {}):
                    missing.append(f"{grp}.{mod}")
        if missing:
            raise ValueError(
                f"checkpoint is missing required tensors: {missing}")
        return
    if cfg.arch == "mamba":
        for mod in ("in_proj", "out_proj", "x_proj", "dt_proj", "norm",
                    "conv_w", "A_log", "D"):
            if mod not in layers:
                missing.append(f"layers.{mod}")
        if missing:
            raise ValueError(
                f"checkpoint is missing required tensors: {missing}")
        return
    if cfg.num_experts > 0:
        mods = ("qkv_proj", "o_proj", "input_norm", "post_norm")
        if "moe" not in layers:
            missing.append("layers.moe")
        else:
            for sub in ("router", "gate_up", "down"):
                if sub not in layers["moe"]:
                    missing.append(f"layers.moe.{sub}")
    else:
        mods = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj",
                "input_norm", "post_norm")
    for mod in mods:
        if mod not in layers:
            missing.append(f"layers.{mod}")
            continue
        algo = cfg.module_algo(mod)
        tensors = layers[mod]
        if mod.endswith("norm"):
            want = {"w"}
        elif algo.is_mix:
            want = {"qweight", "scale_col", "fp_ind", "fp_weight"}
        elif algo.is_lr:
            want = {"qweight", "scale_col", "lr_u", "lr_v"}
        elif algo == QuantAlgo.W4A16_G:
            want = {"qweight", "scale_g"}
        elif algo.is_weight_only or algo.is_fp8:
            want = {"qweight", "scale_col"}
        else:
            want = {"w"}
        for t in want:
            if t not in tensors and not (
                    t == "qweight" and "qweight_packed" in tensors):
                missing.append(f"layers.{mod}.{t}")
    if missing:
        raise ValueError(f"checkpoint is missing required tensors: {missing}")
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if n_layers != cfg.num_layers:
        raise ValueError(
            f"checkpoint has {n_layers} stacked layers, config says "
            f"{cfg.num_layers}")
