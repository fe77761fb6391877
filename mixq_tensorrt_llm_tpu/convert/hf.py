"""HF model directory -> quantized TPU checkpoint (the `quantize` pipeline).

Replaces the reference's quantize.py -> quantize_and_export flow
(quantize.py:451 main -> tensorrt_llm/quantization/quantize_by_modelopt.py:380
-> modelopt export pack_linear_weights, SURVEY §3.1) without the modelopt
detour: read HF safetensors, optionally calibrate act_scales on the float
model, quantize per QuantConfig routing, save our checkpoint.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Iterable, Mapping, Optional

import numpy as np

from ..models import registry
from ..models.common import ModelConfig
from ..quant.config import QuantConfig
from . import calibrate as calib
from .checkpoint import save_checkpoint


def load_hf_state_dict(hf_dir: str) -> Dict[str, np.ndarray]:
    """Load all tensors from an HF model dir (safetensors or torch .bin)."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(hf_dir, "*.safetensors")))
    if st_files:
        import safetensors.numpy
        for f in st_files:
            sd.update(safetensors.numpy.load_file(f))
        return sd
    bin_files = sorted(glob.glob(os.path.join(hf_dir, "pytorch_model*.bin")))
    if bin_files:
        import torch
        for f in bin_files:
            part = torch.load(f, map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in part.items()})
        return sd
    raise FileNotFoundError(f"no model weights found in {hf_dir}")


def load_hf_config(hf_dir: str):
    from transformers import AutoConfig
    return AutoConfig.from_pretrained(hf_dir)


def quantize_hf_model(
    hf_dir: str,
    output_dir: str,
    quant: QuantConfig,
    act_scales: Optional[Mapping[str, np.ndarray]] = None,
    act_scales_path: Optional[str] = None,
    calib_batches: Optional[Iterable[np.ndarray]] = None,
    dtype=None,
    lora_dir: Optional[str] = None,
) -> ModelConfig:
    """Full pipeline: HF dir -> (calibration) -> quantize -> checkpoint dir.

    For mix algos an outlier ranking is required; precedence:
      explicit act_scales > act_scales_path (.pt/.npz artifact) >
      in-graph calibration over calib_batches > absent (falls back to ones,
      a warning-worthy but valid choice mirrored from the reference's
      hard-coded-path behavior, model_config_utils.py:391-393).
    """
    hf_config = load_hf_config(hf_dir)
    cfg = registry.config_from_hf(hf_config, quant)
    if dtype is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, dtype=dtype)
    # tied lm_head needs no fixup: cfg.tie_word_embeddings makes the
    # forward use embed.T for logits
    sd = load_hf_state_dict(hf_dir)
    if lora_dir:
        from .lora import merge_lora_into_state_dict
        sd = merge_lora_into_state_dict(sd, lora_dir)

    if act_scales is None and act_scales_path:
        act_scales = calib.load_act_scales(act_scales_path)
    if act_scales is None and calib_batches is not None and quant.algo.is_mix:
        import dataclasses
        float_cfg = dataclasses.replace(cfg, quant=QuantConfig())
        float_params = registry.params_from_hf(float_cfg, sd)
        act_scales = calib.calibrate_act_scales(float_params, float_cfg,
                                                calib_batches)
        del float_params

    params = registry.params_from_hf(cfg, sd, act_scales)
    save_checkpoint(output_dir, params, cfg)
    if act_scales is not None:
        calib.save_act_scales(act_scales,
                              os.path.join(output_dir, "act_scales.npz"))
    _copy_tokenizer_files(hf_dir, output_dir)
    return cfg


def _copy_tokenizer_files(hf_dir: str, output_dir: str) -> None:
    """Carry tokenizer artifacts into the checkpoint so it is usable
    standalone (generate/eval need them)."""
    import shutil
    patterns = ("tokenizer.json", "tokenizer_config.json", "tokenizer.model",
                "special_tokens_map.json", "vocab.json", "merges.txt",
                "added_tokens.json", "chat_template.jinja")
    for name in patterns:
        src = os.path.join(hf_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(output_dir, name))
