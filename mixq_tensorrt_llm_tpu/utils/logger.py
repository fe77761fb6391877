"""Logger singleton (reference tensorrt_llm/logger.py equivalent).

Levels map 1:1 to the reference's --log_level flag values; the TRT logger
bridge is replaced by plain stdlib logging (XLA logs ride their own
channels).
"""

from __future__ import annotations

import logging
import os
import sys

_LEVELS = {
    "verbose": logging.DEBUG,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}


def _make_logger() -> logging.Logger:
    lg = logging.getLogger("mixq_tpu")
    if not lg.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "[%(asctime)s][mixq-tpu][%(levelname)s] %(message)s",
            datefmt="%H:%M:%S"))
        lg.addHandler(h)
        lg.propagate = False
    lg.setLevel(_LEVELS.get(os.environ.get("MIXQ_LOG_LEVEL", "warning"),
                            logging.WARNING))
    return lg


logger = _make_logger()


def set_level(level: str) -> None:
    logger.setLevel(_LEVELS[level])
