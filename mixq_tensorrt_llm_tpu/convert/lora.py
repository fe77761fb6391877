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


# ---------------------------------------------------------------------------
# Runtime multi-adapter serving (reference lora_manager + per-request
# LoraConfig in the executor bindings): adapters stay UNMERGED, stacked
# into per-module (L, N+1, in, R) / (L, N+1, R, out) arrays; lane
# `lora_ids` gather the right adapter inside the jitted forward. Slot 0
# is the base model (all-zero delta).
# ---------------------------------------------------------------------------

# PEFT target module -> (our fused module, out-slice key). Offsets are
# resolved against the ModelConfig (llama-lineage naming; the fused-GEMM
# trick: per-target B matrices land in disjoint column slices, so several
# rank-r targets become ONE rank-sum(r) adapter on the fused weight).
_FUSED_TARGETS = {
    "q_proj": ("qkv_proj", "q"),
    "k_proj": ("qkv_proj", "k"),
    "v_proj": ("qkv_proj", "v"),
    "o_proj": ("o_proj", "full"),
    "gate_proj": ("gate_up_proj", "gate"),
    "up_proj": ("gate_up_proj", "up"),
    "down_proj": ("down_proj", "full"),
}


def _module_geom(cfg):
    """our module -> (in_features, out_features, {slice_key: offset})."""
    return {
        "qkv_proj": (cfg.hidden_size, cfg.qkv_out,
                     {"q": 0, "k": cfg.q_size, "v": cfg.q_size + cfg.kv_size}),
        "o_proj": (cfg.q_size, cfg.hidden_size, {"full": 0}),
        "gate_up_proj": (cfg.hidden_size, 2 * cfg.intermediate_size,
                         {"gate": 0, "up": cfg.intermediate_size}),
        "down_proj": (cfg.intermediate_size, cfg.hidden_size, {"full": 0}),
    }


def build_lora_stack(cfg, adapter_dirs):
    """PEFT dirs -> {module: {"A": (L, N+1, in, R), "B": (L, N+1, R, out)}}.

    Adapter n (1-based; 0 = base/no-op) contributes its targets' A columns
    and scaled-B rows; ranks are padded to the per-module max across
    adapters. Only modules some adapter targets get an entry.
    """
    import re as _re
    import jax.numpy as jnp

    geom = _module_geom(cfg)
    adapters = []
    for d in adapter_dirs:
        acfg, tensors = load_adapter(d)
        scale = acfg.get("lora_alpha", 1) / acfg.get("r", 1)
        # per (layer, our-module): list of (slice_key, A (r,in), B (out,r))
        per = {}
        lay_re = _re.compile(r"model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)$")
        for module, ab in tensors.items():
            m = lay_re.search(module)
            if not m or m.group(2) not in _FUSED_TARGETS:
                continue
            i, tgt = int(m.group(1)), m.group(2)
            ours, skey = _FUSED_TARGETS[tgt]
            per.setdefault((i, ours), []).append(
                (skey, ab["A"], ab["B"] * scale))
        if not per:
            raise ValueError(f"adapter in {d} matched no supported targets")
        adapters.append(per)

    n = len(adapters)
    stack = {}
    for mod, (nin, nout, offsets) in geom.items():
        rmax = 0
        for per in adapters:
            for i in range(cfg.num_layers):
                parts = per.get((i, mod), [])
                rmax = max(rmax, sum(a.shape[0] for _, a, _ in parts))
        if rmax == 0:
            continue
        A = np.zeros((cfg.num_layers, n + 1, nin, rmax), np.float32)
        B = np.zeros((cfg.num_layers, n + 1, rmax, nout), np.float32)
        for ai, per in enumerate(adapters):
            for i in range(cfg.num_layers):
                r0 = 0
                for skey, a, b in per.get((i, mod), []):
                    r = a.shape[0]
                    off = offsets[skey]
                    A[i, ai + 1, :, r0:r0 + r] = a.T
                    B[i, ai + 1, r0:r0 + r, off:off + b.shape[0]] = b.T
                    r0 += r
        stack[mod] = {"A": jnp.asarray(A, jnp.bfloat16),
                      "B": jnp.asarray(B, jnp.bfloat16)}
    return stack


def attach_lora(params, stack):
    """Attach stacked adapters to a quantized params pytree (in place)."""
    for mod, ab in stack.items():
        params["layers"][mod]["lora_A"] = ab["A"]
        params["layers"][mod]["lora_B"] = ab["B"]
    return params
