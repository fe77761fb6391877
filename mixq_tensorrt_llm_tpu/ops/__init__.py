from . import ref  # noqa: F401
from . import dispatch  # noqa: F401
from . import mixed_matmul  # noqa: F401
from . import wo_matmul  # noqa: F401
from . import norm_quant  # noqa: F401
