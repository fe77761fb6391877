from .logger import logger, set_level  # noqa: F401
from .profiler import profiler, Profiler, device_trace, device_memory_stats  # noqa: F401
