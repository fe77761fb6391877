"""Draft-model speculative decoding.

Reference parity: the speculative niche filled there by medusa / ReDrafter
and the KVCacheUpdater's draft-token rewind (runtime/medusa_utils.py,
kv_cache_manager.py:380-464). TPU re-design: classic two-model speculative
sampling — a small draft model proposes gamma tokens autoregressively, the
target verifies all of them in ONE batched forward (a gamma+1-token
"mini-prefill", which is exactly the static-shape regime TPUs like), and
the standard accept/resample rule keeps the output distribution equal to
the target's. Greedy mode accepts the longest prefix where draft ==
target argmax. Cache rewind is free: both caches keep absolute positions,
so rejected slots are simply overwritten on the next iteration
(kv_valid_len masks them, the reference needed an explicit updater).
"""

from __future__ import annotations

import dataclasses
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
