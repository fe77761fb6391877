"""ReDrafter decoding: recurrent drafter beams verified in one forward.

Reference parity: tensorrt_llm/models/redrafter/ (drafter.py Drafter =
input_proj + silu ResBlocks + lm_head, optional RNN token embedding;
redrafter_helper.py _beam_search_candidates beam search and greedy-path
acceptance via num_accepted_tokens/accepted_beam_index) and
runtime/redrafter_utils.py.

TPU re-design: the reference dedups beams into a dynamic token tree per
step (dynamic shapes the TRT engine absorbs via spec-decoding inputs).
Under XLA everything must be static, so verification runs the FULL beam
block — [true token | beam_0 candidates | ... | beam_{K-1} candidates],
1 + K*Lc rows — with a compile-time attention mask (each candidate sees
the committed history, the shared true token, and its own beam prefix).
Duplicated prefixes across beams cost redundant FLOPs but keep one
compiled program for the whole decode; acceptance is the greedy walk per
beam (longest prefix matching the target's argmax chain, reference
greedy_search mode), so output == plain greedy decode regardless of
drafter quality. Accepted rows are compacted in-graph to contiguous KV
slots (same gather+dynamic-slice as runtime/medusa.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common as mcommon
from ..models.common import KVCache, ModelConfig


def init_random_drafter(cfg: ModelConfig, key: jax.Array,
                        exit_dim: int = 0, num_layers: int = 1,
                        is_rnn: bool = True) -> Dict:
    """Random drafter with the reference parameter schema
    (models/redrafter/drafter.py Drafter.__init__: input 2H -> exit_dim
    ResBlocks -> vocab head; rnn_w bias-free, rnn_u biased)."""
    h, v = cfg.hidden_size, cfg.vocab_size
    exit_dim = exit_dim or 2 * h
    ks = jax.random.split(key, 5)
    std = 0.02
    p: Dict = {
        "blocks": {
            "w": jax.random.normal(ks[0], (num_layers, exit_dim, exit_dim),
                                   jnp.float32) * std,
            "b": jnp.zeros((num_layers, exit_dim), jnp.float32),
        },
        "lm_head": {"w": jax.random.normal(ks[1], (exit_dim, v),
                                           jnp.float32) * std},
    }
    if exit_dim != 2 * h:
        p["input_proj"] = {
            "w": jax.random.normal(ks[2], (2 * h, exit_dim),
                                   jnp.float32) * std,
            "b": jnp.zeros((exit_dim,), jnp.float32)}
    if is_rnn:
        p["rnn_w"] = {"w": jax.random.normal(ks[3], (h, h),
                                             jnp.float32) * std}
        p["rnn_u"] = {"w": jax.random.normal(ks[4], (h, h),
                                             jnp.float32) * std,
                      "b": jnp.zeros((h,), jnp.float32)}
    return p


def drafter_from_hf(sd) -> Dict:
    """ReDrafter drafter checkpoint -> drafter pytree (reference
    models/redrafter/drafter.py parameter names: input_proj, layers.{i}
    ResBlock linears, lm_head, rnn_u/rnn_w)."""
    import numpy as np

    def arr(key):
        for pre in ("drafter.", ""):
            if pre + key in sd:
                return jnp.asarray(np.asarray(sd[pre + key]))
        raise KeyError(key)

    n = 0
    while any(p + f"layers.{n}.linear.weight" in sd
              for p in ("drafter.", "")):
        n += 1
    out: Dict = {
        "blocks": {
            "w": jnp.stack([arr(f"layers.{l}.linear.weight").T
                            for l in range(n)]).astype(jnp.float32),
            "b": jnp.stack([arr(f"layers.{l}.linear.bias")
                            for l in range(n)]).astype(jnp.float32)},
        "lm_head": {"w": arr("lm_head.weight").T.astype(jnp.float32)},
    }
    for p in ("drafter.", ""):
        if p + "input_proj.weight" in sd:
            out["input_proj"] = {"w": arr("input_proj.weight").T
                                 .astype(jnp.float32),
                                 "b": arr("input_proj.bias")
                                 .astype(jnp.float32)}
            break
    for p in ("drafter.", ""):
        if p + "rnn_w.weight" in sd:
            out["rnn_w"] = {"w": arr("rnn_w.weight").T.astype(jnp.float32)}
            out["rnn_u"] = {"w": arr("rnn_u.weight").T.astype(jnp.float32),
                            "b": arr("rnn_u.bias").astype(jnp.float32)}
            break
    return out


def drafter_logits(drafter: Dict, x2h: jax.Array) -> jax.Array:
    """x2h (..., 2H) = [base hidden | token embedding] -> (..., V)."""
    x = x2h.astype(jnp.float32)
    if "input_proj" in drafter:
        x = x @ drafter["input_proj"]["w"].astype(jnp.float32) \
            + drafter["input_proj"]["b"]
    bw = drafter["blocks"]["w"].astype(jnp.float32)
    bb = drafter["blocks"]["b"].astype(jnp.float32)
    for l in range(bw.shape[0]):
        x = x + jax.nn.silu(x @ bw[l] + bb[l])
    return x @ drafter["lm_head"]["w"].astype(jnp.float32)


def beam_search_draft(drafter: Dict, embed_w: jax.Array, hidden: jax.Array,
                      init_token: jax.Array, num_beams: int,
                      candidate_length: int) -> jax.Array:
    """Reference _beam_search_candidates, in-graph and static-shaped.

    hidden (H,) base-model hidden at the true token; init_token scalar.
    Non-RNN drafters accumulate token embeddings by sum; RNN drafters run
    e_t = rnn_w(emb) + rnn_u(e_{t-1}). Returns (num_beams,
    candidate_length) draft tokens (the true token excluded).
    """
    h = hidden.astype(jnp.float32)
    k = num_beams
    is_rnn = "rnn_w" in drafter
    scores = jnp.array([0.0] + [-5e4] * (k - 1), jnp.float32)
    last = jnp.full((k,), init_token, jnp.int32)
    prev_emb = jnp.zeros((k, h.shape[-1]), jnp.float32)
    tokens = jnp.zeros((k, candidate_length), jnp.int32)
    v = embed_w.shape[0]
    for i in range(candidate_length):
        cur = embed_w[last].astype(jnp.float32)            # (K, H)
        if is_rnn:
            e = cur @ drafter["rnn_w"]["w"].astype(jnp.float32)
            if i > 0:
                e = e + prev_emb @ drafter["rnn_u"]["w"].astype(jnp.float32) \
                    + drafter["rnn_u"]["b"]
            prev_emb = e
        else:
            prev_emb = cur + prev_emb
        x2h = jnp.concatenate(
            [jnp.broadcast_to(h, (k, h.shape[-1])), prev_emb], axis=-1)
        lp = jax.nn.log_softmax(drafter_logits(drafter, x2h), axis=-1)
        flat = (lp + scores[:, None]).reshape(k * v)
        scores, idx = jax.lax.top_k(flat, k)               # (K,)
        beam_src = idx // v
        new_tok = (idx % v).astype(jnp.int32)
        tokens = tokens[beam_src].at[:, i].set(new_tok)
        prev_emb = prev_emb[beam_src]
        last = new_tok
    return tokens


@dataclass
class ReDrafterStats:
    steps: int = 0
    tokens: int = 0

    @property
    def tokens_per_step(self) -> float:
        return self.tokens / max(self.steps, 1)


@functools.lru_cache(maxsize=64)
def _programs(cfg: ModelConfig, k: int, lc: int, s0: int, smax: int):
    """Jitted (prefill, verify, compact, draft) for one (cfg, beams,
    shape) key — repeated redrafter_generate calls reuse the compiled
    programs instead of re-tracing per request."""
    n = k * lc

    @jax.jit
    def prefill(params, cache, tokens):
        pos = jnp.arange(s0, dtype=jnp.int32)[None]
        logits, cache, hidden = mcommon.forward(
            params, cfg, tokens, pos, cache,
            jnp.full((1,), s0, jnp.int32), full_prefill=True,
            return_hidden=True)
        return logits[:, -1], cache, hidden[:, -1]

    # static mask: row 0 = true token; row 1 + b*lc + j = beam b cand j,
    # attending the true token and its own beam prefix
    anc = np.zeros((n + 1, n + 1), bool)
    anc[:, 0] = True
    for bm in range(k):
        for j in range(lc):
            r = 1 + bm * lc + j
            anc[r, 1 + bm * lc: r + 1] = True
    anc_j = jnp.asarray(anc)
    # per-row depth: true token 0, beam cand j at depth j+1
    depths = np.zeros((n + 1,), np.int32)
    for bm in range(k):
        for j in range(lc):
            depths[1 + bm * lc + j] = j + 1
    depths_j = jnp.asarray(depths)

    @jax.jit
    def verify(params, cache, rows, t):
        pos = depths_j[None] + t
        slots = jnp.arange(n + 1, dtype=jnp.int32)[None] + t
        kv_idx = jnp.arange(cache.k.shape[2])
        hist = kv_idx[None, None, None, :] < t
        in_blk = (kv_idx[None, None, None, :] >= t) & \
                 (kv_idx[None, None, None, :] < t + n + 1)
        blk = jnp.zeros((1, 1, n + 1, cache.k.shape[2]), bool)
        blk = jax.lax.dynamic_update_slice(blk, anc_j[None, None],
                                           (0, 0, 0, t))
        mask = hist | (in_blk & blk)
        return mcommon.forward(params, cfg, rows, slots, cache,
                               jnp.full((1,), t + n + 1, jnp.int32),
                               attn_mask=mask, return_hidden=True,
                               rope_pos=pos)

    @jax.jit
    def compact(cache, slot_path, t):
        def fix(a):
            sel = a[:, :, t + slot_path]
            return jax.lax.dynamic_update_slice_in_dim(a, sel, t, axis=2)
        return KVCache(
            k=fix(cache.k), v=fix(cache.v),
            k_scale=fix(cache.k_scale) if cache.k_scale is not None else None,
            v_scale=fix(cache.v_scale) if cache.v_scale is not None else None)

    @jax.jit
    def draft_jit(params, drafter, hidden, tok):
        return beam_search_draft(drafter, params["embed"]["w"], hidden[0],
                                 tok, k, lc)

    return prefill, verify, compact, draft_jit


def redrafter_generate(params: Dict, cfg: ModelConfig,
                       drafter: Optional[Dict],
                       prompt: Sequence[int], max_new_tokens: int,
                       num_beams: int = 4, draft_len: int = 4,
                       max_seq_len: int = 0,
                       draft_fn: Optional[Callable] = None,
                       ) -> Tuple[List[int], ReDrafterStats]:
    """Greedy ReDrafter decode for one sequence.

    draft_fn(hidden (1,H), next_tok, step) -> (num_beams, draft_len)
    overrides the drafter (tests inject an oracle). Output equals plain
    greedy decode; a trained drafter only raises tokens/step.
    Returns (prompt + generated, stats).
    """
    k, lc = num_beams, draft_len
    n = k * lc                              # candidate rows
    s0 = len(prompt)
    smax = max_seq_len or s0 + max_new_tokens + n + 2
    assert smax >= s0 + max_new_tokens + n + 1
    prefill, verify, compact, draft_jit = _programs(cfg, k, lc, s0, smax)
    cache = mcommon.init_kv_cache(cfg, 1, smax)

    logits, cache, hidden = prefill(
        params, cache, jnp.asarray(np.asarray(prompt, np.int32)[None]))
    committed: List[int] = list(prompt)
    next_tok = int(jax.device_get(jnp.argmax(logits[0])))
    t = s0
    stats = ReDrafterStats()

    while len(committed) - s0 < max_new_tokens:
        stats.steps += 1
        # drafter reads the base model's LAST hidden state (pre-final-norm
        # residual stream, reference _process_logits_and_hidden_states)
        if draft_fn is not None:
            beams = np.asarray(draft_fn(hidden, next_tok, stats.steps),
                               np.int32)
        else:
            beams = np.asarray(jax.device_get(
                draft_jit(params, drafter, hidden, jnp.int32(next_tok))))
        rows = jnp.asarray(
            np.concatenate([[next_tok], beams.reshape(-1)])[None]
            .astype(np.int32))

        logits, new_cache, hidden_all = verify(params, cache, rows, t)
        lg = np.asarray(jax.device_get(jnp.argmax(logits[0], axis=-1)))

        # greedy acceptance: longest beam prefix matching the argmax chain
        best_m, best_b = 0, 0
        for bm in range(k):
            m, expect = 0, lg[0]
            while m < lc and beams[bm, m] == expect:
                expect = lg[1 + bm * lc + m]
                m += 1
            if m > best_m:
                best_m, best_b = m, bm
        path = [0] + [1 + best_b * lc + j for j in range(best_m)]
        accepted = [next_tok] + [int(beams[best_b, j])
                                 for j in range(best_m)]
        bonus = int(lg[path[-1]])

        room = max_new_tokens - (len(committed) - s0)
        accepted = accepted[:room]
        path = path[:len(accepted)]

        slot_path = np.zeros((n + 1,), np.int32)
        slot_path[:len(path)] = path
        cache = compact(new_cache, jnp.asarray(slot_path), t)
        committed.extend(accepted)
        stats.tokens += len(accepted)
        t += len(accepted)
        next_tok = bonus
        hidden = hidden_all[:, path[len(accepted) - 1]]

    return committed, stats
