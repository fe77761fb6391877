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
    repetition_penalty: float = 1.0   # >1 discourages repeats (HF semantics)

    @property
    def is_greedy(self) -> bool:
        return self.greedy or self.temperature == 0.0


def apply_repetition_penalty(logits: jax.Array, history: jax.Array,
                             penalty: float) -> jax.Array:
    """HF-style penalty over a token-history window.

    history (B, W) int32, padded with -1. Positive logits of seen tokens
    are divided by `penalty`, negative ones multiplied.
    """
    b, v = logits.shape
    seen = jnp.zeros((b, v), bool)
    w = history.shape[1]
    onehot = jax.nn.one_hot(jnp.where(history < 0, v, history), v + 1,
                            dtype=jnp.bool_)[..., :v]      # (B, W, V)
    seen = jnp.any(onehot, axis=1)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def sample(logits: jax.Array, key: jax.Array,
           config: SamplingConfig,
           history: jax.Array = None,
           suppress_token: jax.Array = None,
           suppress_flag: jax.Array = None) -> jax.Array:
    """logits (B, V) float32 -> token ids (B,) int32.

    history: optional (B, W) recent tokens for repetition penalty.
    suppress_token/suppress_flag: optional traced scalars; when flag != 0
    the given token id's logit is pushed to -inf (min_new_tokens eos ban,
    reference dynamic-decoder behavior) without recompiling per step.
    """
    if config.repetition_penalty != 1.0 and history is not None:
        logits = apply_repetition_penalty(logits, history,
                                          config.repetition_penalty)
    if suppress_token is not None:
        v = logits.shape[-1]
        hit = jnp.arange(v)[None, :] == suppress_token
        logits = jnp.where(hit & (suppress_flag != 0), -jnp.inf, logits)

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
