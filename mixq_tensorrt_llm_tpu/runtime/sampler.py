"""Token sampling: greedy / temperature / top-k / top-p, jittable.

Replaces the reference's dynamic_decoder sampling layer
(tensorrt_llm/runtime/generation.py sampling config handling; SamplingConfig
in model_runner.py). Two entry points:

  * sample(logits, key, SamplingConfig) — static config, used by the dense
    GenerationSession where one config applies to the whole batch.
  * sample_batched(logits, key, SamplingParams) — every parameter is a
    traced per-lane array, so a continuous-batching executor can honor a
    different SamplingConfig per request (reference: per-Request
    SamplingConfig in bindings/executor.pyi) inside ONE compiled program —
    no recompile when a request with new settings is admitted.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

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


class SamplingParams(NamedTuple):
    """Per-lane sampling parameters as traced (B,) arrays.

    Semantics match SamplingConfig field-for-field; `top_k == 0` and
    `top_p == 1.0` disable those filters for that lane. Built from a list
    of per-request SamplingConfigs with `batch_params`.
    """

    temperature: jax.Array        # (B,) f32
    top_k: jax.Array              # (B,) i32, 0 = off
    top_p: jax.Array              # (B,) f32, 1.0 = off
    greedy: jax.Array             # (B,) bool
    repetition_penalty: jax.Array  # (B,) f32, 1.0 = off


def batch_params(configs) -> SamplingParams:
    """List of SamplingConfig (None entries = defaults) -> SamplingParams."""
    import numpy as np
    configs = [c if c is not None else SamplingConfig() for c in configs]
    return SamplingParams(
        temperature=jnp.asarray(
            np.array([c.temperature for c in configs], np.float32)),
        top_k=jnp.asarray(np.array([c.top_k for c in configs], np.int32)),
        top_p=jnp.asarray(np.array([c.top_p for c in configs], np.float32)),
        greedy=jnp.asarray(np.array([c.is_greedy for c in configs], bool)),
        repetition_penalty=jnp.asarray(
            np.array([c.repetition_penalty for c in configs], np.float32)),
    )


def _apply_repetition_penalty_batched(logits, history, penalty):
    """history (B, W) int32 padded with -1; penalty (B,) f32."""
    b, v = logits.shape
    onehot = jax.nn.one_hot(jnp.where(history < 0, v, history), v + 1,
                            dtype=jnp.bool_)[..., :v]
    seen = jnp.any(onehot, axis=1)
    pen = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen & (pen != 1.0), penalized, logits)


def sample_batched(logits: jax.Array, key: jax.Array,
                   params: SamplingParams,
                   history: Optional[jax.Array] = None,
                   suppress_token: Optional[jax.Array] = None,
                   suppress_flag: Optional[jax.Array] = None) -> jax.Array:
    """logits (B, V) f32 -> tokens (B,) i32, all parameters traced per lane.

    Every lane pays the sort for top-k/top-p filtering even when disabled —
    the price of a single compiled program — but V-sized sorts are noise
    next to a decode step, and lanes with the filters off are handled by
    `where` masks, so the math is exactly the static-path math lane-wise.
    """
    b, v = logits.shape
    if history is not None:
        logits = _apply_repetition_penalty_batched(
            logits, history, params.repetition_penalty)
    if suppress_token is not None:
        hit = jnp.arange(v)[None, :] == suppress_token[:, None]
        logits = jnp.where(hit & (suppress_flag[:, None] != 0),
                           -jnp.inf, logits)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    scaled = logits / jnp.maximum(params.temperature, 1e-6)[:, None]

    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]          # (B, V)
    # top-k: k-th largest value per lane (k clipped into range; k=0 -> off)
    k_idx = jnp.clip(params.top_k - 1, 0, v - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    scaled = jnp.where((params.top_k[:, None] > 0) & (scaled < kth),
                       -jnp.inf, scaled)
    # top-p runs after top-k on the renormalized surviving distribution
    # (HF / static-path ordering): mask ranks >= k in the sorted view
    rank = jnp.arange(v)[None, :]
    sorted_masked = jnp.where(
        (params.top_k[:, None] > 0) & (rank >= params.top_k[:, None]),
        -jnp.inf, sorted_desc)
    probs = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < params.top_p[:, None], axis=-1)
    cutoff_logit = jnp.take_along_axis(
        sorted_masked, jnp.clip(cutoff_idx, 0, v - 1)[:, None], axis=-1)
    scaled = jnp.where((params.top_p[:, None] < 1.0) & (scaled < cutoff_logit),
                       -jnp.inf, scaled)

    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(params.greedy, greedy_tok, sampled)
