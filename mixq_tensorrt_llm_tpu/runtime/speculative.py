"""Draft-model speculative decoding.

Reference parity: the speculative niche filled there by medusa / ReDrafter
and the KVCacheUpdater's draft-token rewind (runtime/medusa_utils.py,
kv_cache_manager.py:380-464). TPU re-design: classic two-model speculative
sampling — a small draft model proposes gamma tokens autoregressively, the
target verifies all of them in ONE batched forward (a gamma+1-token
"mini-prefill", which is exactly the static-shape regime TPUs like), and
the standard accept/resample rule keeps the output distribution equal to
the target's. Cache rewind is free: both caches keep absolute positions,
so rejected slots are simply overwritten on the next iteration
(kv_valid_len masks them, the reference needed an explicit updater).

Two drivers:
- speculative_generate: single-sequence greedy (accepts the longest prefix
  where draft == target argmax; output provably equals target-only greedy).
- speculative_generate_batched: B sequences, stochastic accept/resample
  (Leviathan-rule: accept x_j with prob min(1, p(x_j)/q(x_j)); on first
  rejection emit a sample of norm(max(p-q, 0)) — the output distribution
  is exactly the target's, see _accept_resample, which is unit-tested for
  distribution equality by Monte Carlo). Each iteration is two compiled
  calls (draft scan of gamma+1 steps, target verify + in-graph
  accept/resample) and ONE host readback, per the async-relay rules.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common as mcommon
from ..models.common import ModelConfig


@dataclasses.dataclass
class SpecStats:
    proposed: int = 0
    accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0


def speculative_generate(
    target_params: Dict, target_cfg: ModelConfig,
    draft_params: Dict, draft_cfg: ModelConfig,
    prompt: Sequence[int], max_new_tokens: int, gamma: int = 4,
    eos_token_id: Optional[int] = None, max_seq_len: int = 2048,
):
    """Greedy speculative decoding for a single sequence.

    Returns (tokens including prompt, SpecStats). Output is identical to
    greedy decoding with the target model alone (verified by tests).
    """
    assert target_cfg.vocab_size == draft_cfg.vocab_size
    prompt = list(prompt)
    n0 = len(prompt)

    t_cache = mcommon.init_kv_cache(target_cfg, 1, max_seq_len)
    d_cache = mcommon.init_kv_cache(draft_cfg, 1, max_seq_len)

    def _prefill(params, cfg, tokens, cache):
        s = len(tokens)
        tok = jnp.asarray(np.asarray(tokens, np.int32))[None]
        pos = jnp.arange(s, dtype=jnp.int32)[None]
        logits, cache = mcommon.forward(params, cfg, tok, pos, cache,
                                        jnp.full((1,), s, jnp.int32))
        return np.asarray(logits[0]), cache

    t_logits, t_cache = _prefill(target_params, target_cfg, prompt, t_cache)
    _, d_cache = _prefill(draft_params, draft_cfg, prompt, d_cache)

    def _step(params, cfg, cache, token, position, valid_len):
        tok = jnp.asarray([[token]], jnp.int32)
        pos = jnp.asarray([[position]], jnp.int32)
        logits, cache = mcommon.forward(params, cfg, tok, pos, cache,
                                        jnp.full((1,), valid_len, jnp.int32))
        return np.asarray(logits[0, 0]), cache

    def _verify(params, cfg, cache, tokens, start_pos, valid_len):
        s = len(tokens)
        tok = jnp.asarray(np.asarray(tokens, np.int32))[None]
        pos = (start_pos + jnp.arange(s, dtype=jnp.int32))[None]
        logits, cache = mcommon.forward(params, cfg, tok, pos, cache,
                                        jnp.full((1,), valid_len, jnp.int32))
        return np.asarray(logits[0]), cache

    out = list(prompt)
    stats = SpecStats()
    cur = int(t_logits[n0 - 1].argmax())
    out.append(cur)

    while len(out) - n0 < max_new_tokens:
        if eos_token_id is not None and out[-1] == eos_token_id:
            break
        base = len(out)          # tokens known-good so far
        g = min(gamma, max_new_tokens - (len(out) - n0),
                max_seq_len - base - 1)
        if g <= 0:
            break

        # draft proposes g tokens autoregressively from `cur`
        draft_tokens: List[int] = []
        tok = out[-1]
        for j in range(g):
            pos = base - 1 + j
            d_logits, d_cache = _step(draft_params, draft_cfg, d_cache,
                                      tok, pos, pos + 1)
            tok = int(d_logits.argmax())
            draft_tokens.append(tok)

        # target verifies [last_accepted] + drafts in one forward
        verify_input = [out[-1]] + draft_tokens
        t_logits, t_cache = _verify(target_params, target_cfg, t_cache,
                                    verify_input, base - 1,
                                    base - 1 + len(verify_input))
        target_preds = t_logits.argmax(-1)   # prediction AFTER each input

        stats.proposed += g
        n_accept = 0
        for j in range(g):
            if draft_tokens[j] == int(target_preds[j]):
                n_accept += 1
                if eos_token_id is not None and \
                        draft_tokens[j] == eos_token_id:
                    break
            else:
                break
        stats.accepted += n_accept
        accepted = draft_tokens[:n_accept]
        # the target's own prediction after the last accepted token comes
        # free from the same verify pass
        bonus = int(target_preds[n_accept])
        new_tokens = accepted + [bonus]
        room = max_new_tokens - (len(out) - n0)
        out.extend(new_tokens[:room])

        # resync the draft cache: positions for rejected drafts will simply
        # be overwritten; feed it the accepted tokens it hasn't seen
        # (they were already written during drafting for accepted ones)
        if eos_token_id is not None and eos_token_id in new_tokens[:room]:
            break

    if eos_token_id is not None and eos_token_id in out[n0:]:
        out = out[: n0 + out[n0:].index(eos_token_id) + 1]
    return out, stats


# ---------------------------------------------------------------------------
# Batched stochastic speculative sampling
# ---------------------------------------------------------------------------

def _accept_resample(p, q, draft_toks, key, greedy: bool = False):
    """Leviathan accept/resample rule, vectorized over a batch.

    p: (B, G+1, V) target probs after each verify input; q: (B, G, V)
    draft proposal distributions; draft_toks: (B, G) tokens sampled from q.
    Accept x_j with prob min(1, p_j(x_j)/q_j(x_j)); at the first rejection
    emit a sample of norm(max(p_j - q_j, 0)); if all G accepted, emit a
    bonus sample of p_G. Marginal distribution of the emitted prefix is
    EXACTLY the target's (tested by Monte Carlo in test_speculative).

    Returns (n_accept (B,) int32, extra_token (B,) int32).
    """
    b, g, v = q.shape
    px = jnp.take_along_axis(p[:, :g], draft_toks[..., None], -1)[..., 0]
    qx = jnp.take_along_axis(q, draft_toks[..., None], -1)[..., 0]
    k_acc, k_res = jax.random.split(key)
    if greedy:
        acc = draft_toks == jnp.argmax(p[:, :g], axis=-1)
    else:
        u = jax.random.uniform(k_acc, (b, g))
        acc = u * qx < px                     # u < p/q without the divide
    lead = jnp.cumprod(acc.astype(jnp.int32), axis=-1)
    n = jnp.sum(lead, axis=-1).astype(jnp.int32)          # (B,)
    p_n = jnp.take_along_axis(p, n[:, None, None], 1)[:, 0]   # (B, V)
    q_n = jnp.take_along_axis(q, jnp.minimum(n, g - 1)[:, None, None],
                              1)[:, 0]
    if greedy:
        # greedy correction is the target argmax itself (the residual
        # subtraction below is a stochastic-mode construct)
        extra = jnp.argmax(p_n, axis=-1).astype(jnp.int32)
        return n, extra
    q_n = jnp.where((n < g)[:, None], q_n, 0.0)   # all-accept: resid = p_G
    resid = jnp.clip(p_n - q_n, 0.0, None)
    s = resid.sum(-1, keepdims=True)
    resid = jnp.where(s > 1e-9, resid / jnp.maximum(s, 1e-9), p_n)
    extra = jax.random.categorical(
        k_res, jnp.log(jnp.maximum(resid, 1e-30))).astype(jnp.int32)
    return n, extra


def speculative_generate_batched(
    target_params: Dict, target_cfg: ModelConfig,
    draft_params: Dict, draft_cfg: ModelConfig,
    prompts: Sequence[Sequence[int]], max_new_tokens: int, gamma: int = 4,
    temperature: float = 1.0, eos_token_id: Optional[int] = None,
    max_seq_len: int = 2048, seed: int = 0,
):
    """Stochastic speculative sampling over a batch of prompts.

    temperature <= 0 selects greedy mode (argmax accept; output equals
    target-only greedy decoding). Otherwise tokens are distributed exactly
    as temperature-sampling from the target alone. Returns (list of token
    lists including prompts, SpecStats).

    Per iteration: one compiled draft pass (a 2-token catch-up+first-step
    forward, then gamma-1 scanned single-token steps), one compiled target
    verify with the in-graph accept/resample, one host readback. The
    catch-up token re-feeds out[-2] to the draft: after a full-accept
    round the bonus token's predecessor was never drafted, so its draft-KV
    slot is a hole; re-feeding is idempotent for already-written slots
    (causal KV depends only on earlier, correct positions).
    """
    assert target_cfg.vocab_size == draft_cfg.vocab_size
    b = len(prompts)
    g = gamma
    greedy = temperature <= 0.0
    n0s = [len(p) for p in prompts]
    max_prompt = max(n0s)
    assert max_prompt + max_new_tokens + g + 1 <= max_seq_len, \
        "need gamma+1 slack below max_seq_len for the verify window"

    t_cache = mcommon.init_kv_cache(target_cfg, b, max_seq_len)
    d_cache = mcommon.init_kv_cache(draft_cfg, b, max_seq_len)

    toks = np.zeros((b, max_prompt), np.int32)
    for i, p in enumerate(prompts):
        toks[i, :len(p)] = p
    lens = jnp.asarray(n0s, jnp.int32)
    pos0 = jnp.tile(jnp.arange(max_prompt, dtype=jnp.int32), (b, 1))

    def _warp(logits):
        if greedy:
            return logits
        return logits.astype(jnp.float32) / max(temperature, 1e-4)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_t(params, cache, key):
        logits, cache = mcommon.forward(params, target_cfg,
                                        jnp.asarray(toks), pos0, cache, lens)
        last = jnp.take_along_axis(
            logits, (lens - 1)[:, None, None].astype(jnp.int32), 1)[:, 0]
        if greedy:
            first = jnp.argmax(last, -1).astype(jnp.int32)
        else:
            first = jax.random.categorical(key, _warp(last)).astype(jnp.int32)
        return first, cache

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_d(params, cache):
        _, cache = mcommon.forward(params, draft_cfg,
                                   jnp.asarray(toks), pos0, cache, lens)
        return cache

    @functools.partial(jax.jit, donate_argnums=(1,))
    def draft_fn(params, cache, win, base, key):
        """win (B,2) = [out[-2], out[-1]]; returns gamma proposals."""
        pos2 = jnp.stack([base - 2, base - 1], axis=1)
        logits, cache = mcommon.forward(params, draft_cfg, win, pos2,
                                        cache, base)
        key, sub = jax.random.split(key)
        q0 = jax.nn.softmax(_warp(logits[:, 1]), axis=-1)
        if greedy:
            x = jnp.argmax(q0, -1).astype(jnp.int32)
        else:
            x = jax.random.categorical(sub, _warp(logits[:, 1])).astype(
                jnp.int32)

        def body(carry, j):
            cache, tok, key = carry
            pos = (base - 1 + j)[:, None]
            lg, cache = mcommon.forward(params, draft_cfg,
                                        tok[:, None], pos, cache, base + j)
            qj = jax.nn.softmax(_warp(lg[:, 0]), axis=-1)
            key, sub = jax.random.split(key)
            if greedy:
                nxt = jnp.argmax(qj, -1).astype(jnp.int32)
            else:
                nxt = jax.random.categorical(sub, _warp(lg[:, 0])).astype(
                    jnp.int32)
            return (cache, nxt, key), (tok, qj)

        if g > 1:
            (cache, last_x, key), (xs, qs) = jax.lax.scan(
                body, (cache, x, key), jnp.arange(1, g, dtype=jnp.int32))
            draft_toks = jnp.concatenate(
                [jnp.moveaxis(xs, 0, 1), last_x[:, None]], axis=1)
            q_probs = jnp.concatenate(
                [q0[:, None], jnp.moveaxis(qs, 0, 1)], axis=1)
        else:
            draft_toks = x[:, None]
            q_probs = q0[:, None]
        return draft_toks, q_probs, cache, key

    @functools.partial(jax.jit, donate_argnums=(1,))
    def verify_fn(params, cache, last_tok, draft_toks, q_probs, base, key):
        vin = jnp.concatenate([last_tok[:, None], draft_toks], axis=1)
        pos = base[:, None] - 1 + jnp.arange(g + 1, dtype=jnp.int32)[None]
        logits, cache = mcommon.forward(params, target_cfg, vin, pos,
                                        cache, base + g)
        p = jax.nn.softmax(_warp(logits), axis=-1)
        key, sub = jax.random.split(key)
        n, extra = _accept_resample(p, q_probs, draft_toks, sub,
                                    greedy=greedy)
        return n, extra, cache, key

    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    first, t_cache = prefill_t(target_params, t_cache, sub)
    d_cache = prefill_d(draft_params, d_cache)

    out = [list(p) for p in prompts]
    first_np = np.asarray(first)
    done = np.zeros((b,), bool)
    for i in range(b):
        out[i].append(int(first_np[i]))
        if eos_token_id is not None and out[i][-1] == eos_token_id:
            done[i] = True
    stats = SpecStats()

    while True:
        active = [i for i in range(b)
                  if not done[i] and len(out[i]) - n0s[i] < max_new_tokens]
        if not active:
            break
        base = np.asarray([len(o) for o in out], np.int32)
        win = np.stack([[o[-2], o[-1]] for o in out]).astype(np.int32)
        draft_toks, q_probs, d_cache, key = draft_fn(
            draft_params, d_cache, jnp.asarray(win), jnp.asarray(base), key)
        n, extra, t_cache, key = verify_fn(
            target_params, t_cache, jnp.asarray(win[:, 1]), draft_toks,
            q_probs, jnp.asarray(base), key)
        draft_np, n_np, extra_np = (np.asarray(draft_toks), np.asarray(n),
                                    np.asarray(extra))
        for i in active:
            room = max_new_tokens - (len(out[i]) - n0s[i])
            new = list(draft_np[i, :n_np[i]]) + [int(extra_np[i])]
            stats.proposed += g
            stats.accepted += int(n_np[i])
            for t in new[:room]:
                out[i].append(int(t))
                if eos_token_id is not None and t == eos_token_id:
                    done[i] = True
                    break

    for i in range(b):
        gen = out[i][n0s[i]:]
        if eos_token_id is not None and eos_token_id in gen:
            out[i] = out[i][: n0s[i] + gen.index(eos_token_id) + 1]
    return out, stats
