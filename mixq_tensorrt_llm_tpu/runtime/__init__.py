from .sampler import SamplingConfig, sample  # noqa: F401
from .session import GenerationSession, GenerationOutput  # noqa: F401
from .kv_cache import (BlockManager, PagedKVState, init_paged_kv)  # noqa: F401
from .scheduler import Executor, Request  # noqa: F401
from .medusa import medusa_generate, build_tree, MedusaStats  # noqa: F401
from .redrafter import (redrafter_generate, init_random_drafter,  # noqa: F401
                        ReDrafterStats)
