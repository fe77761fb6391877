from .mapping import Mapping, AXIS_ORDER  # noqa: F401
from .sharding import (param_specs, shard_params, token_spec,  # noqa: F401
                       cache_spec)
