"""Architecture registry: HF config -> (ModelConfig, converter).

Replacement for the reference's model zoo dispatch
(tensorrt_llm/models/__init__.py MODEL_MAP; MixQ/src/mixquant/models/auto.py
CAUSAL_LM_MODEL_MAP). Llama covers the llama/mistral lineage; Qwen2 differs
only by qkv bias and defaults, so both share models/llama.py converters.
"""

from __future__ import annotations

from ..quant.config import QuantConfig
from . import llama

SUPPORTED_ARCHS = {
    "llama": "llama",
    "mistral": "llama",
    "mixtral": "mixtral",
    "qwen2": "qwen2",
}


def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()):
    mt = hf_config.model_type.lower()
    if mt not in SUPPORTED_ARCHS:
        raise ValueError(
            f"unsupported model_type {mt!r}; supported: {sorted(SUPPORTED_ARCHS)}")
    return llama.config_from_hf(hf_config, quant)
