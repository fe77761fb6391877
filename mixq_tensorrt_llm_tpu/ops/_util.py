"""Shared Pallas kernel utilities."""

from __future__ import annotations

import functools

import jax


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pick_block(dim: int, target: int) -> int:
    """Largest multiple-of-128 divisor of dim that is <= target."""
    best = 128
    b = 128
    while b <= min(target, dim):
        if dim % b == 0:
            best = b
        b += 128
    return best


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def kernel_enabled(env: str) -> bool:
    """Gate for routing an op through its Pallas kernel: on by default on
    TPU, off elsewhere; env var overrides — "0" disables everywhere,
    "force" enables even off-TPU (the kernel then runs in interpret mode
    via resolve_interpret, which is how the CPU mesh tests exercise the
    multi-device kernel data plane)."""
    import os
    v = os.environ.get(env, "1")
    if v == "force":
        return True
    return _on_tpu() and v != "0"


def resolve_interpret(interpret) -> bool:
    """None -> interpret on non-TPU platforms (so MIXQ_BACKEND=pallas works
    on CPU for debugging); explicit bool wins."""
    if interpret is None:
        return not _on_tpu()
    return bool(interpret)
