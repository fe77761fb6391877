"""LoRA adapter support: merge PEFT adapters into base weights.

Reference parity: tensorrt_llm's lora_manager (runtime/lora_manager.py,
768 LoC of runtime adapter juggling). TPU round-1 scope: merge-at-quantize
— W' = W + (alpha/r) * B @ A folded into the float weights *before*
quantization, so the quantized checkpoint bakes the adapter in at zero
runtime cost (the dominant deployment mode for a single adapter). Runtime
multi-adapter switching is a later round.

Reads standard PEFT artifacts: adapter_config.json (r, lora_alpha,
target_modules) + adapter_model.safetensors with keys like
`base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight`.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, Mapping, Tuple

import numpy as np

_KEY_RE = re.compile(
    r"(?:base_model\.model\.)?(?P<module>.+)\.lora_(?P<ab>[AB])\.weight$")


def load_adapter(adapter_dir: str) -> Tuple[dict, Dict[str, dict]]:
    """Returns (adapter_config, {hf_module_path: {"A": ..., "B": ...}})."""
    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        cfg = json.load(f)
    tensors: Dict[str, dict] = {}
    files = (glob.glob(os.path.join(adapter_dir, "adapter_model.safetensors"))
             or glob.glob(os.path.join(adapter_dir, "adapter_model.bin")))
    if not files:
        raise FileNotFoundError(f"no adapter weights in {adapter_dir}")
    if files[0].endswith(".safetensors"):
        import safetensors.numpy
        raw = safetensors.numpy.load_file(files[0])
    else:
        import torch
        raw = {k: v.float().numpy()
               for k, v in torch.load(files[0], map_location="cpu",
                                      weights_only=True).items()}
    for key, val in raw.items():
        m = _KEY_RE.match(key)
        if not m:
            continue
        tensors.setdefault(m.group("module"), {})[m.group("ab")] = \
            np.asarray(val, np.float32)
    return cfg, tensors


def merge_lora_into_state_dict(sd: Mapping[str, np.ndarray],
                               adapter_dir: str) -> Dict[str, np.ndarray]:
    """HF state dict + PEFT dir -> state dict with W' = W + scale * B @ A.

    PEFT stores lora_A (r, in) and lora_B (out, r) for a torch (out, in)
    weight; scale = lora_alpha / r.
    """
    cfg, tensors = load_adapter(adapter_dir)
    scale = cfg.get("lora_alpha", 1) / cfg.get("r", 1)
    out = dict(sd)
    merged = 0
    for module, ab in tensors.items():
        if "A" not in ab or "B" not in ab:
            continue
        wkey = module + ".weight"
        if wkey not in out:
            raise KeyError(f"adapter targets missing base weight: {wkey}")
        delta = (ab["B"] @ ab["A"]) * scale           # (out, in)
        out[wkey] = np.asarray(out[wkey], np.float32) + delta
        merged += 1
    if merged == 0:
        raise ValueError(f"adapter in {adapter_dir} matched no base weights")
    return out
