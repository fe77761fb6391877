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
    peak_blocks: Optional[int] = None   # paged path: peak pool pages used


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

    return _backtrack(prompts, k, beam_tokens, beam_parents,
                      np.asarray(beam_scores), length_penalty, eos_token_id)


def _backtrack(prompts, k: int, beam_tokens, beam_parents, scores_np,
               length_penalty: float, eos_token_id) -> BeamResult:
    """Trace the best hypothesis per prompt through the parent chain.

    beam_tokens: per-step (B*K,) chosen tokens; beam_parents: per-step
    (B, K) parent beam index (one fewer entry than beam_tokens)."""
    b = len(prompts)
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


# ---------------------------------------------------------------------------
# Paged beam search: KV blocks shared across beams via fork + copy-on-write
# ---------------------------------------------------------------------------

def _copy_pages(pools: dict, src: jax.Array, dst: jax.Array) -> dict:
    """Device-side COW page copy: pool rows dst[i] <- src[i] (self-copies
    are harmless no-ops by construction — padding uses src == dst == 0).
    Runs once per decode step OUTSIDE the forward jit, so the pool buffer
    stays donated/in-place."""
    return {name: p.at[dst].set(p[src]) for name, p in pools.items()}


def paged_beam_search(params, cfg: ModelConfig,
                      prompts: Sequence[Sequence[int]],
                      max_new_tokens: int, num_beams: int = 4,
                      length_penalty: float = 1.0,
                      eos_token_id: Optional[int] = None,
                      max_seq_len: int = 2048,
                      block_size: int = 64) -> BeamResult:
    """Beam search over the paged KV pool with block sharing.

    Reference parity: kv_cache_manager.py:66-244 beam-width block sharing —
    all beams of a prompt share the prompt's KV blocks (written ONCE, vs
    the dense path's jnp.repeat which duplicates the cache K times); a
    shared tail block is copy-on-write duplicated (BlockManager
    ensure_exclusive) only when a beam writes into it. Beam reordering is
    host-side block-list surgery (fork to parents + free old lists) — no
    device gather of cache contents at all.

    Pool accounting: prompts cost ceil(P/BS) blocks once, each beam adds
    only its divergent tail (~1/K of the dense footprint for long prompts).
    """
    from . import kv_cache as pkv
    from ..ops._util import _on_tpu

    b, k = len(prompts), num_beams
    lens_list = [len(p) for p in prompts]
    max_prompt = max(lens_list)
    assert max_prompt + max_new_tokens <= max_seq_len
    if _on_tpu() and cfg.quant.kv_cache.name == "INT8" and block_size < 128:
        block_size = 128   # TPU decode-kernel constraint (see Executor)

    bm = pkv.BlockManager(
        num_blocks=1 + b * (-(-max_prompt // block_size))
        + b * k * (-(-(max_new_tokens + 1) // block_size) + 2),
        block_size=block_size)
    mb = -(-(max_prompt + max_new_tokens + 1) // block_size)
    state = pkv.init_paged_kv(cfg, bm.num_blocks, block_size)
    pools = {"k": state.k, "v": state.v}
    if state.quantized:
        pools.update(k_scale=state.k_scale, v_scale=state.v_scale)

    def to_state(pools):
        return pkv.PagedKVState(pools["k"], pools["v"],
                                pools.get("k_scale"), pools.get("v_scale"))

    # ---- prefill: ONE sequence per prompt (lane i*k), blocks written once
    for i in range(b):
        bm.add_sequence(i * k, lens_list[i])
    prefill_ids = [i * k for i in range(b)]
    tokens = np.zeros((b, max_prompt), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, :len(p)] = p
    lens = jnp.asarray(lens_list, jnp.int32)
    table_p = jnp.asarray(bm.block_table(prefill_ids, mb))
    pos = jnp.tile(jnp.arange(max_prompt, dtype=jnp.int32), (b, 1))

    @jax.jit
    def prefill(params, tokens, state, table, lens):
        logits, state = mcommon.forward_paged(
            params, cfg, tokens, pos, state, table, lens)
        last = jnp.take_along_axis(
            logits, (lens - 1)[:, None, None].astype(jnp.int32), axis=1)
        return jax.nn.log_softmax(last[:, 0], axis=-1), state

    logp0, state = prefill(params, jnp.asarray(tokens), to_state(pools),
                           table_p, lens)
    pools = {"k": state.k, "v": state.v}
    if state.quantized:
        pools.update(k_scale=state.k_scale, v_scale=state.v_scale)

    # ---- fork: beams share every prompt block (ref-counted, zero copies)
    for i in range(b):
        for j in range(1, k):
            bm.fork(i * k, i * k + j)
    peak_blocks = bm.num_blocks - bm.num_free

    top_lp, top_tok = jax.lax.top_k(logp0, k)           # (B, K)
    beam_scores = top_lp
    beam_tokens = [np.asarray(top_tok).reshape(b * k)]
    beam_parents: List[np.ndarray] = []
    cur = top_tok.reshape(b * k)
    cur_lens = np.repeat(np.asarray(lens_list, np.int64), k)
    finished = np.zeros((b, k), bool)
    if eos_token_id is not None:
        finished |= np.asarray(top_tok) == eos_token_id

    n_lanes = b * k

    @functools.partial(jax.jit, donate_argnums=(0,))
    def cow(pools, src, dst):
        return _copy_pages(pools, src, dst)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, cur, state, table, cur_lens, beam_scores,
             finished_mask):
        logits, state = mcommon.forward_paged(
            params, cfg, cur[:, None], cur_lens[:, None].astype(jnp.int32),
            state, table, cur_lens + 1)
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        logp = logp.reshape(b, k, v)
        cont = jnp.where(finished_mask[:, :, None], NEG_INF, logp)
        cont = cont.at[:, :, 0].set(
            jnp.where(finished_mask, 0.0, cont[:, :, 0]))
        total = beam_scores[:, :, None] + cont
        flat = total.reshape(b, k * v)
        new_scores, idx = jax.lax.top_k(flat, k)
        parent = idx // v
        token = (idx % v).astype(jnp.int32)
        return state, new_scores, parent, token

    nl = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    nb = bm.num_blocks

    def run_cow(pools):
        """Make every lane's write block exclusive before the device step."""
        pairs = []
        for lane in range(n_lanes):
            pos_w = bm.seqs[lane].length
            bm.extend(lane, 1)
            dup = bm.ensure_exclusive(lane, pos_w)
            if dup is not None:
                pairs.append(dup)
        src = np.zeros((n_lanes,), np.int32)
        dst = np.zeros((n_lanes,), np.int32)
        for j, (s, d) in enumerate(pairs):
            src[j], dst[j] = s, d
        if pairs:
            # expand to flat pool rows: every layer's copy of the page
            src_r = (np.arange(nl)[:, None] * nb + src[None, :]).reshape(-1)
            dst_r = (np.arange(nl)[:, None] * nb + dst[None, :]).reshape(-1)
            pools = cow(pools, jnp.asarray(src_r), jnp.asarray(dst_r))
        return pools

    all_lanes = list(range(n_lanes))
    for _ in range(max_new_tokens - 1):
        if finished.all():
            break
        pools = run_cow(pools)
        peak_blocks = max(peak_blocks, bm.num_blocks - bm.num_free)
        table = jnp.asarray(bm.block_table(all_lanes, mb))
        state, beam_scores, parent, token = step(
            params, cur, to_state(pools), table,
            jnp.asarray(cur_lens, jnp.int32), beam_scores,
            jnp.asarray(finished))
        pools = {"k": state.k, "v": state.v}
        if state.quantized:
            pools.update(k_scale=state.k_scale, v_scale=state.v_scale)
        parent_np = np.asarray(parent)
        token_np = np.asarray(token)

        # host-side beam reorder: each new lane adopts its parent's block
        # list (ref-counted fork); the abandoned lists free their blocks
        tmp_base = n_lanes
        for i in range(b):
            for j in range(k):
                bm.fork(i * k + int(parent_np[i, j]), tmp_base + i * k + j)
        for lane in all_lanes:
            bm.free_sequence(lane)
        for lane in all_lanes:
            sb = bm.seqs.pop(tmp_base + lane)
            sb.seq_id = lane
            bm.seqs[lane] = sb

        finished = np.take_along_axis(finished, parent_np, axis=1)
        if eos_token_id is not None:
            finished |= token_np == eos_token_id
        beam_parents.append(parent_np)
        beam_tokens.append(token_np.reshape(b * k))
        cur = jnp.asarray(token_np.reshape(b * k))
        cur_lens = cur_lens + 1

    result = _backtrack(prompts, k, beam_tokens, beam_parents,
                        np.asarray(beam_scores), length_penalty,
                        eos_token_id)
    result.peak_blocks = peak_blocks
    return result
