from .common import ModelConfig, KVCache, init_kv_cache, forward  # noqa: F401
from . import llama  # noqa: F401
from .registry import config_from_hf, SUPPORTED_ARCHS  # noqa: F401
