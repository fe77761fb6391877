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


BW_PAD = -2   # bad-words pad: never equals a token id or the -1 history pad


def pack_bad_words(bad_words, max_len: int = 0) -> "jnp.ndarray":
    """List of token-id sequences -> (N, L) int32, RIGHT-aligned, BW_PAD
    padded (reference bad-words lists, generation.py dynamic decoder /
    executor.pyi Request.bad_words). L is padded to >= max(2, max_len) so
    distinct word sets of similar shape share one compiled program."""
    import numpy as np
    words = [list(w) for w in (bad_words or [])]
    n = len(words)
    l = max([len(w) for w in words] + [max_len, 2])
    out = np.full((n, l), BW_PAD, np.int32)
    for i, w in enumerate(words):
        assert len(w) >= 1, "empty bad word"
        out[i, l - len(w):] = w
    return jnp.asarray(out)


def ban_bad_words(logits: jax.Array, history: jax.Array,
                  bad_words: jax.Array) -> jax.Array:
    """Mask the final token of any bad-word sequence whose prefix matches
    the tail of the generated history.

    logits (B, V) or per-lane bad words (B, N, L) with logits (B, V);
    history (B, W) right-aligned, -1 padded; bad_words (N, L) shared or
    (B, N, L) per lane, right-aligned, BW_PAD padded. Single-token words
    (prefix empty) are always banned — HF / reference semantics. W must
    cover the longest prefix (L-1 <= W)."""
    if bad_words.ndim == 2:
        bad_words = bad_words[None]          # (1, N, L) broadcast over B
    b, v = logits.shape
    n, l = bad_words.shape[1], bad_words.shape[2]
    if n == 0:
        return logits
    w = history.shape[1]
    assert l - 1 <= w, "history window shorter than bad-word prefix"
    tail = history[:, w - (l - 1):]                      # (B, L-1)
    prefix = bad_words[:, :, :-1]                        # (B|1, N, L-1)
    ok = (prefix == BW_PAD) | (tail[:, None, :] == prefix)
    match = jnp.all(ok, axis=-1)                         # (B, N)
    # all-pad filler rows (lanes with fewer words than the buffer) are
    # inert: a pad in the LAST slot marks the row unused
    match &= bad_words[:, :, -1] != BW_PAD
    last = jnp.clip(bad_words[:, :, -1], 0, v - 1)       # (B|1, N)
    onehot = jax.nn.one_hot(last, v, dtype=jnp.bool_)    # (B|1, N, V)
    ban = jnp.any(match[..., None] & onehot, axis=1)     # (B, V)
    return jnp.where(ban, -jnp.inf, logits)


def sample(logits: jax.Array, key: jax.Array,
           config: SamplingConfig,
           history: jax.Array = None,
           suppress_token: jax.Array = None,
           suppress_flag: jax.Array = None,
           bad_words: jax.Array = None,
           processors: tuple = ()) -> jax.Array:
    """logits (B, V) float32 -> token ids (B,) int32.

    history: optional (B, W) recent tokens for repetition penalty.
    suppress_token/suppress_flag: optional traced scalars; when flag != 0
    the given token id's logit is pushed to -inf (min_new_tokens eos ban,
    reference dynamic-decoder behavior) without recompiling per step.
    bad_words: optional (N, L) packed array (pack_bad_words).
    processors: jax-traceable `(logits, history) -> logits` callables run
    on the raw logits first (reference logits_post_processor).
    """
    for f in processors:
        logits = f(logits, history)
    if config.repetition_penalty != 1.0 and history is not None:
        logits = apply_repetition_penalty(logits, history,
                                          config.repetition_penalty)
    if bad_words is not None and bad_words.shape[0] > 0:
        logits = ban_bad_words(logits, history, bad_words)
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
                   suppress_flag: Optional[jax.Array] = None,
                   bad_words: Optional[jax.Array] = None,
                   processors: tuple = ()) -> jax.Array:
    """logits (B, V) f32 -> tokens (B,) i32, all parameters traced per lane.

    Every lane pays the sort for top-k/top-p filtering even when disabled —
    the price of a single compiled program — but V-sized sorts are noise
    next to a decode step, and lanes with the filters off are handled by
    `where` masks, so the math is exactly the static-path math lane-wise.
    bad_words: optional per-lane (B, N, L) packed array (pack_bad_words
    per request, stacked; all-BW_PAD rows never match).
    processors: jax-traceable `(logits, history) -> logits` callables run
    on the raw logits first (reference logits_post_processor).
    """
    b, v = logits.shape
    for f in processors:
        logits = f(logits, history)
    if history is not None:
        logits = _apply_repetition_penalty_batched(
            logits, history, params.repetition_penalty)
    if bad_words is not None and bad_words.shape[-2] > 0:
        logits = ban_bad_words(logits, history, bad_words)
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
