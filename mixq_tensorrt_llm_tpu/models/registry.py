"""Architecture registry: HF config -> (ModelConfig, converter).

Replacement for the reference's model zoo dispatch
(tensorrt_llm/models/__init__.py MODEL_MAP; MixQ/src/mixquant/models/auto.py
CAUSAL_LM_MODEL_MAP). The llama lineage (llama/mistral/qwen2/mixtral/
aquila) shares models/llama.py converters; every other family routes
through models/families.py, which maps each arch onto the single
config-driven decoder in models/common.py.
"""

from __future__ import annotations

from ..quant.config import QuantConfig
from . import llama

# model_type -> converter module key ("llama" lineage vs "families")
SUPPORTED_ARCHS = {
    "llama": "llama",
    "mistral": "llama",
    "mixtral": "llama",
    "qwen2": "llama",
    "aquila": "llama",          # llama clone (MixQ auto.py registry)
    "opt": "families",
    "gpt2": "families",
    "gptj": "families",
    "gpt_neox": "families",
    "falcon": "families",
    "refinedweb": "families",       # early falcon model_type strings
    "refinedwebmodel": "families",
    "bloom": "families",
    "mpt": "families",
    "phi": "families",
    "phi3": "families",
    "dbrx": "families",
    "gemma": "families",
    "gemma2": "families",
    "qwen3": "families",
    "qwen2_moe": "families",
    "qwen3_moe": "families",
    "glm": "families",
    "glm4": "families",
    "olmo2": "families",
    "cohere": "families",
    "granite": "families",
    "baichuan": "families",
    "gpt_bigcode": "families",
    "starcoder2": "families",
    "stablelm": "families",
    "mamba": "mamba",           # selective SSM (tensorrt_llm/models/mamba)
    "recurrent_gemma": "recurrentgemma",   # Griffin hybrid
}


def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()):
    mt = hf_config.model_type.lower()
    kind = SUPPORTED_ARCHS.get(mt)
    if kind is None:
        raise ValueError(
            f"unsupported model_type {mt!r}; supported: {sorted(SUPPORTED_ARCHS)}")
    if kind == "llama":
        return llama.config_from_hf(hf_config, quant)
    if kind == "mamba":
        from . import mamba
        return mamba.config_from_hf(hf_config, quant)
    if kind == "recurrentgemma":
        from . import recurrentgemma
        return recurrentgemma.config_from_hf(hf_config, quant)
    from . import families
    return families.config_from_hf(hf_config, quant)


def params_from_hf(cfg, hf_state, act_scales=None):
    """Dispatch the HF-weights conversion by cfg.arch."""
    if cfg.arch in ("llama", "mistral", "mixtral", "qwen2", "aquila"):
        return llama.params_from_hf(cfg, hf_state, act_scales)
    if cfg.arch == "mamba":
        from . import mamba
        return mamba.params_from_hf(cfg, hf_state, act_scales)
    if cfg.arch == "recurrentgemma":
        from . import recurrentgemma
        return recurrentgemma.params_from_hf(cfg, hf_state, act_scales)
    from . import families
    return families.params_from_hf(cfg, hf_state, act_scales)


def init_random_params(cfg, key, act_scales=None):
    """Random-weight init honoring every config axis (tests/benches)."""
    if cfg.arch in ("llama", "mistral", "mixtral", "qwen2", "aquila"):
        return llama.init_random_params(cfg, key, act_scales)
    if cfg.arch == "mamba":
        from . import mamba
        return mamba.init_random_params(cfg, key, act_scales)
    if cfg.arch == "recurrentgemma":
        from . import recurrentgemma
        return recurrentgemma.init_random_params(cfg, key, act_scales)
    from . import families
    return families.init_random_params(cfg, key, act_scales)
