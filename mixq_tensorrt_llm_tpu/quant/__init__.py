from .config import QuantAlgo, QuantConfig, KVCacheQuantAlgo  # noqa: F401
from . import core  # noqa: F401
