"""Token sampling: greedy / temperature / top-k / top-p, jittable.

Replaces the reference's dynamic_decoder sampling layer
(tensorrt_llm/runtime/generation.py sampling config handling; SamplingConfig
in model_runner.py). Beam search is intentionally deferred (SURVEY T16:
"top-k/top-p sampler first; speculative later").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling parameters (hashable -> jit static arg)."""

    temperature: float = 1.0
    top_k: int = 0               # 0 = disabled
    top_p: float = 1.0           # 1.0 = disabled
    greedy: bool = True

    @property
    def is_greedy(self) -> bool:
        return self.greedy or self.temperature == 0.0


def sample(logits: jax.Array, key: jax.Array,
           config: SamplingConfig) -> jax.Array:
    """logits (B, V) float32 -> token ids (B,) int32."""
    if config.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / jnp.maximum(config.temperature, 1e-6)

    if config.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -config.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if config.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < config.top_p, axis=-1)
        cutoff_logit = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None],
                                           axis=-1)
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)

    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
