"""Process-global XLA compilation counter.

The reference's engine contract is that serving never compiles: TRT builds
every program offline and the runtime only executes them
(/root/reference/tensorrt_llm/builder.py:785-986 build() -> serialized
engine). Under jit the equivalent guarantee is Executor.warmup() having
enumerated every program the serving loop can hit — and round 3 measured
what one miss costs: a cold pow2 burst rung landing mid-serving turned a
455 tok/s run into 36 (docs/PERF.md "cold ladder compiles must be
warmed"). This module makes the guarantee OBSERVABLE instead of hoped-for:
jax.monitoring emits `/jax/core/compile/backend_compile_duration` once
per backend compile AND once per persistent-cache load (measured:
tools/startup_bench.py's cached start shows compiled=9, cache_loaded=9
— the duration event wraps both paths; `cache_hit_count()` separates
them). For the no-compiles-after-warmup contract that conflation is
fine: a post-warmup cache LOAD also costs ~1.7 s on chip and deserves
flagging. A monotone counter sampled after
warmup() pins "no compiles after warmup" — the executor exposes the delta
in IterationStats-adjacent accounting and /health, and
tests/test_compile_watch.py drives a mixed workload asserting it stays 0.
"""

from __future__ import annotations

import jax.monitoring

_COMPILE_EVENT = "/jax/core/compile/backend_compile_duration"
_CACHE_HIT_EVENT = "/jax/compilation_cache/cache_hits"

_compiles = [0]
_cache_hits = [0]
_registered = [False]


def _on_duration(name: str, secs: float, **kw) -> None:
    if name == _COMPILE_EVENT:
        _compiles[0] += 1


def _on_event(name: str, **kw) -> None:
    if name == _CACHE_HIT_EVENT:
        _cache_hits[0] += 1


def ensure_registered() -> None:
    """Idempotently hook jax.monitoring. Counting starts at the first
    call — register before building the programs you want counted."""
    if not _registered[0]:
        jax.monitoring.register_event_duration_secs_listener(_on_duration)
        jax.monitoring.register_event_listener(_on_event)
        _registered[0] = True


def compile_count() -> int:
    """Backend compilations observed since registration (monotone)."""
    ensure_registered()
    return _compiles[0]


def cache_hit_count() -> int:
    """Persistent-compilation-cache hits (programs loaded, not compiled)
    since registration — the precompile-once-serve-many signal."""
    ensure_registered()
    return _cache_hits[0]
