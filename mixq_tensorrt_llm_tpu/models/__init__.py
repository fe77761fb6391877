from .common import ModelConfig, KVCache, init_kv_cache, forward  # noqa: F401
from . import llama  # noqa: F401
from .registry import (config_from_hf, SUPPORTED_ARCHS,  # noqa: F401
                       params_from_hf, init_random_params)
from . import registry  # noqa: F401
from . import t5  # noqa: F401  (encoder-decoder branch)
from . import bert  # noqa: F401  (encoder-only branch)
