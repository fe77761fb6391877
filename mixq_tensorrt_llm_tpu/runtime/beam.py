"""Beam-search decoding over the functional model.

Reference parity: tensorrt_llm beam search (runtime/generation.py dynamic
decoder beam path, SamplingConfig.num_beams). TPU re-design: beams live as
a flattened batch dimension (B*K rows) so every step is the same compiled
decode program as sampling; beam reordering is a gather on the cache's
batch axis (the reference shares KV blocks across beams via the cache
manager — a gather is the dense-cache equivalent and keeps shapes static).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common as mcommon
from ..models.common import KVCache, ModelConfig

NEG_INF = -1e9


@dataclasses.dataclass
class BeamResult:
    sequences: List[List[int]]      # best hypothesis per input (incl prompt)
    scores: List[float]             # sum logprob / length_penalty


def _tile_cache(cache: KVCache, k: int) -> KVCache:
    def tile(x):
        if x is None:
            return None
        return jnp.repeat(x, k, axis=1)   # batch axis of (L, B, S, ...)
    return KVCache(tile(cache.k), tile(cache.v),
                   tile(cache.k_scale), tile(cache.v_scale))


def _reorder_cache(cache: KVCache, rows: jax.Array) -> KVCache:
    def gather(x):
        if x is None:
            return None
        return jnp.take(x, rows, axis=1)
    return KVCache(gather(cache.k), gather(cache.v),
                   gather(cache.k_scale), gather(cache.v_scale))


def beam_search(params, cfg: ModelConfig, prompts: Sequence[Sequence[int]],
                max_new_tokens: int, num_beams: int = 4,
                length_penalty: float = 1.0,
                eos_token_id: Optional[int] = None,
                max_seq_len: int = 2048) -> BeamResult:
    """Batched beam search; returns the best hypothesis per prompt."""
    b = len(prompts)
    k = num_beams
    lens_list = [len(p) for p in prompts]
    max_prompt = max(lens_list)
    assert max_prompt + max_new_tokens <= max_seq_len

    tokens = np.zeros((b, max_prompt), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, :len(p)] = p
    lens = jnp.asarray(lens_list, jnp.int32)

    cache = mcommon.init_kv_cache(cfg, b, max_seq_len)
    pos = jnp.tile(jnp.arange(max_prompt, dtype=jnp.int32), (b, 1))

    @jax.jit
    def prefill(params, tokens, cache, lens):
        logits, cache = mcommon.forward(params, cfg, tokens, pos, cache, lens)
        last = jnp.take_along_axis(
            logits, (lens - 1)[:, None, None].astype(jnp.int32), axis=1)
        return jax.nn.log_softmax(last[:, 0], axis=-1), cache

    logp0, cache = prefill(params, jnp.asarray(tokens), cache, lens)

    # initial beams: top-k tokens of the prompt's last position
    top_lp, top_tok = jax.lax.top_k(logp0, k)          # (B, K)
    beam_scores = top_lp                                # (B, K)
    cache = _tile_cache(cache, k)                       # rows = B*K
    beam_tokens = [np.asarray(top_tok).reshape(b * k)]  # per-step chosen
    beam_parents: List[np.ndarray] = []
    cur = top_tok.reshape(b * k)
    cur_lens = jnp.repeat(lens, k)
    finished = np.zeros((b, k), bool)
    if eos_token_id is not None:
        finished |= np.asarray(top_tok) == eos_token_id

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, cur, cache, cur_lens, beam_scores, finished_mask):
        logits, cache = mcommon.forward(
            params, cfg, cur[:, None], cur_lens[:, None].astype(jnp.int32),
            cache, cur_lens + 1)
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        logp = logp.reshape(b, k, v)
        # finished beams: freeze score, only allow a dummy continuation
        cont = jnp.where(finished_mask[:, :, None], NEG_INF, logp)
        cont = cont.at[:, :, 0].set(
            jnp.where(finished_mask, 0.0, cont[:, :, 0]))
        total = beam_scores[:, :, None] + cont          # (B, K, V)
        flat = total.reshape(b, k * v)
        new_scores, idx = jax.lax.top_k(flat, k)        # (B, K)
        parent = idx // v                               # (B, K) beam index
        token = (idx % v).astype(jnp.int32)
        rows = (jnp.arange(b)[:, None] * k + parent).reshape(b * k)
        cache = _reorder_cache(cache, rows)
        return (token.reshape(b * k), cache, new_scores, parent, token,
                jnp.take(cur_lens, rows))

    for _ in range(max_new_tokens - 1):
        if finished.all():
            break
        fin = jnp.asarray(finished)
        cur, cache, beam_scores, parent, token, cur_lens = step(
            params, cur, cache, cur_lens, beam_scores, fin)
        parent_np = np.asarray(parent)
        token_np = np.asarray(token)
        finished = np.take_along_axis(finished, parent_np, axis=1)
        if eos_token_id is not None:
            finished |= token_np == eos_token_id
        beam_parents.append(parent_np)
        beam_tokens.append(token_np.reshape(b * k))
        cur_lens = cur_lens + 1

    # backtrack the best beam per input
    scores_np = np.asarray(beam_scores)                 # (B, K)
    gen_len = len(beam_tokens)
    norm = scores_np / (gen_len ** length_penalty)
    best = norm.argmax(axis=1)                          # (B,)
    sequences, out_scores = [], []
    for i in range(b):
        beam = int(best[i])
        toks = []
        for t in range(gen_len - 1, -1, -1):
            toks.append(int(beam_tokens[t][i * k + beam]))
            if t > 0:
                beam = int(beam_parents[t - 1][i, beam])
        toks.reverse()
        if eos_token_id is not None and eos_token_id in toks:
            toks = toks[: toks.index(eos_token_id) + 1]
        sequences.append(list(prompts[i]) + toks)
        out_scores.append(float(norm[i, best[i]]))
    return BeamResult(sequences, out_scores)
