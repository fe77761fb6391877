"""Logger / profiler utility tests."""

import jax
import jax.numpy as jnp

from mixq_tensorrt_llm_tpu.utils import (Profiler, device_memory_stats,
                                         logger, set_level)


def test_profiler_ranges():
    p = Profiler()
    with p.range("step"):
        jnp.ones((8, 8)).sum().block_until_ready()
    with p.range("step"):
        pass
    assert p.counts["step"] == 2
    assert p.totals["step"] > 0
    assert "step: total" in p.summary()
    p.reset()
    assert not p.totals


def test_memory_stats_nonnegative():
    x = jnp.ones((128, 128))
    stats = device_memory_stats()
    assert stats.get("bytes_in_use", 0) >= 0
    del x


def test_logger_levels():
    import logging
    set_level("info")
    assert logger.isEnabledFor(logging.INFO)
    set_level("warning")
    assert not logger.isEnabledFor(logging.INFO)
    assert logger.isEnabledFor(logging.WARNING)
