from .sampler import SamplingConfig, sample  # noqa: F401
from .session import GenerationSession, GenerationOutput  # noqa: F401
