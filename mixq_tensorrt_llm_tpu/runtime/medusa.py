"""Medusa decoding: self-drafting heads verified with TREE attention.

Reference parity: tensorrt_llm/models/medusa/model.py (MedusaLayer =
x + act(linear(x)) residual blocks per head + per-head lm_head) and
tensorrt_llm/runtime/medusa_utils.py (choices -> paths -> tree ids /
per-level topks / packed tree mask; the engine consumes the mask through
the gpt_attention plugin's spec-decoding inputs).

TPU re-design: the tree is STATIC at trace time. One verification forward
runs all tree nodes at once with an explicit ancestor attention mask
(models/common.forward(attn_mask=...)) — cache slots and token positions
decouple, queries carry per-node absolute positions for RoPE. Acceptance
is the greedy walk (token at a node must equal the argmax of its parent's
logits), so output == plain greedy decode regardless of head quality;
trained heads only change how many positions each step advances. After
acceptance, the accepted path's KV rows are compacted in-graph from their
tree slots to canonical contiguous positions (one gather + one
dynamic-slice write per pool, batched over layers).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common as mcommon
from ..models.common import KVCache, ModelConfig

# a small default tree: 4 heads, 10 nodes (subset of the reference's
# mc_sim_7b_63 shape — chains plus first-level branching)
DEFAULT_CHOICES = [
    (0,), (0, 0), (0, 0, 0), (0, 0, 0, 0),
    (1,), (1, 0), (2,), (0, 1), (0, 1, 0), (0, 0, 1),
]


@dataclass(frozen=True)
class MedusaTree:
    """Static tree spec (reference medusa_utils._medusa_setup)."""
    depths: np.ndarray        # (N,) 1-based depth of each node
    parents: np.ndarray       # (N,) node index of the parent; -1 = root
    branch: np.ndarray        # (N,) branch index at the node's level
    topks: np.ndarray         # (num_heads,) how many candidates head k needs
    num_heads: int

    @property
    def num_nodes(self) -> int:
        return len(self.depths)


def build_tree(choices: Sequence[Tuple[int, ...]]) -> MedusaTree:
    """choices: paths of per-level branch indices (reference
    medusa_choices). Nodes = unique prefixes, BFS order."""
    prefixes = set()
    for path in choices:
        for d in range(1, len(path) + 1):
            prefixes.add(tuple(path[:d]))
    nodes = sorted(prefixes, key=lambda p: (len(p), p))
    index = {p: i for i, p in enumerate(nodes)}
    depths = np.array([len(p) for p in nodes], np.int32)
    parents = np.array([index[p[:-1]] if len(p) > 1 else -1 for p in nodes],
                       np.int32)
    branch = np.array([p[-1] for p in nodes], np.int32)
    num_heads = int(depths.max())
    topks = np.zeros((num_heads,), np.int32)
    for p in nodes:
        topks[len(p) - 1] = max(topks[len(p) - 1], p[-1] + 1)
    return MedusaTree(depths, parents, branch, topks, num_heads)


def init_random_heads(cfg: ModelConfig, key: jax.Array, num_heads: int,
                      num_layers: int = 1) -> Dict:
    """Random Medusa heads (shape parity with the reference MedusaHead)."""
    ks = jax.random.split(key, 3)
    h, v = cfg.hidden_size, cfg.vocab_size
    return {
        "blocks": {
            "w": jax.random.normal(ks[0], (num_heads, num_layers, h, h),
                                   jnp.float32) * 0.02,
            "b": jnp.zeros((num_heads, num_layers, h), jnp.float32),
        },
        "lm_head": {"w": jax.random.normal(ks[1], (num_heads, h, v),
                                           jnp.float32) * 0.02},
    }


def heads_from_hf(sd, num_heads: int, num_layers: int = 1) -> Dict:
    """HF medusa checkpoint -> heads pytree.

    The released medusa format stores per-head ResBlock stacks + lm_head
    as `{k}.{l}.linear.weight/bias` and `{k}.{num_layers}.weight`
    (medusa_head.* or bare indices; reference models/medusa weight
    loading)."""
    import numpy as np

    def arr(key):
        for pre in ("medusa_head.", ""):
            if pre + key in sd:
                return jnp.asarray(np.asarray(sd[pre + key]))
        raise KeyError(key)

    ws, bs, lms = [], [], []
    for k in range(num_heads):
        ws.append(jnp.stack([arr(f"{k}.{l}.linear.weight").T
                             for l in range(num_layers)]))
        bs.append(jnp.stack([arr(f"{k}.{l}.linear.bias")
                             for l in range(num_layers)]))
        lms.append(arr(f"{k}.{num_layers}.weight").T)
    return {"blocks": {"w": jnp.stack(ws).astype(jnp.float32),
                       "b": jnp.stack(bs).astype(jnp.float32)},
            "lm_head": {"w": jnp.stack(lms).astype(jnp.float32)}}


def head_logits(heads: Dict, hidden: jax.Array) -> jax.Array:
    """hidden (B, H) -> per-head logits (K, B, V).

    Reference MedusaHead.forward: residual blocks x + silu(W x + b),
    then a per-head lm_head (models/medusa/model.py)."""
    def one_head(w, b, lm):
        x = hidden.astype(jnp.float32)
        for l in range(w.shape[0]):
            x = x + jax.nn.silu(x @ w[l] + b[l])
        return x @ lm
    return jax.vmap(one_head)(heads["blocks"]["w"].astype(jnp.float32),
                              heads["blocks"]["b"].astype(jnp.float32),
                              heads["lm_head"]["w"].astype(jnp.float32))


@dataclass
class MedusaStats:
    steps: int = 0
    tokens: int = 0

    @property
    def tokens_per_step(self) -> float:
        return self.tokens / max(self.steps, 1)


import functools


@functools.lru_cache(maxsize=64)
def _programs(cfg: ModelConfig, choices: tuple, s0: int, smax: int):
    """Jitted (prefill, verify, compact) for one (cfg, tree, shape) key —
    repeated medusa_generate calls (a serving loop) reuse the compiled
    programs instead of re-tracing fresh closures per request."""
    tree = build_tree(choices)
    n = tree.num_nodes
    depths_j = jnp.asarray(tree.depths)

    @jax.jit
    def prefill(params, cache, tokens):
        pos = jnp.arange(s0, dtype=jnp.int32)[None]
        logits, cache, hidden = mcommon.forward(
            params, cfg, tokens, pos, cache,
            jnp.full((1,), s0, jnp.int32), full_prefill=True,
            return_hidden=True)
        return logits[:, -1], cache, hidden[:, -1]

    # static within-tree ancestor masks: verify token 0 is the committed
    # next token (depth 0); node i sits at row i+1
    anc = np.zeros((n + 1, n + 1), bool)
    anc[:, 0] = True                      # everyone sees the committed root
    for i in range(n):
        anc[i + 1, i + 1] = True
        p = tree.parents[i]
        while p >= 0:
            anc[i + 1, p + 1] = True
            p = tree.parents[p]
    anc_j = jnp.asarray(anc)

    @jax.jit
    def verify(params, cache, tree_tokens, t):
        """Run [committed_next, tree nodes...] at slots t..t+n.

        tree_tokens (1, n+1); positions: root at t, node i at t+depth_i.
        Returns (logits (1, n+1, V), cache, hidden (1, n+1, H))."""
        pos = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               depths_j])[None] + t
        slots = jnp.arange(n + 1, dtype=jnp.int32)[None] + t
        kv_idx = jnp.arange(cache.k.shape[2])
        # cache part: everything before slot t is committed history the
        # whole tree may attend; tree slots obey the ancestor mask
        hist = kv_idx[None, None, None, :] < t
        in_tree = (kv_idx[None, None, None, :] >= t) & \
                  (kv_idx[None, None, None, :] < t + n + 1)
        tree_part = jnp.zeros((1, 1, n + 1, cache.k.shape[2]), bool)
        tree_part = jax.lax.dynamic_update_slice(
            tree_part, anc_j[None, None], (0, 0, 0, t))
        mask = hist | (in_tree & tree_part)
        logits, cache, hidden = mcommon.forward(
            params, cfg, tree_tokens, slots, cache,
            jnp.full((1,), t + n + 1, jnp.int32), attn_mask=mask,
            return_hidden=True, rope_pos=pos)
        return logits, cache, hidden

    @jax.jit
    def compact(cache, slot_path, t):
        """Move accepted slots' KV rows to contiguous positions from t.

        slot_path (P,) slot offsets (0 = root) padded with 0; padded rows
        are overwritten by later steps and never attended (the history
        mask cuts at the committed length)."""
        def fix(a):
            rows = a[:, :, t + slot_path]          # (L, 1, P, ...)
            return jax.lax.dynamic_update_slice_in_dim(a, rows, t, axis=2)
        return KVCache(
            k=fix(cache.k), v=fix(cache.v),
            k_scale=fix(cache.k_scale) if cache.k_scale is not None else None,
            v_scale=fix(cache.v_scale) if cache.v_scale is not None else None)

    return prefill, verify, compact


def medusa_generate(params: Dict, cfg: ModelConfig, heads: Optional[Dict],
                    prompt: Sequence[int], max_new_tokens: int,
                    choices: Sequence[Tuple[int, ...]] = None,
                    max_seq_len: int = 0,
                    head_logits_fn: Optional[Callable] = None,
                    ) -> Tuple[List[int], MedusaStats]:
    """Greedy Medusa decode for one sequence.

    head_logits_fn(hidden (1,H), step) -> (K, 1, V) overrides the Medusa
    heads (tests inject an oracle to pin full-tree acceptance).
    Returns (prompt + generated tokens, stats).
    """
    choices_t = tuple(tuple(c) for c in (choices or DEFAULT_CHOICES))
    tree = build_tree(choices_t)
    n = tree.num_nodes
    s0 = len(prompt)
    smax = max_seq_len or s0 + max_new_tokens + n + 2
    assert smax >= s0 + max_new_tokens + n + 1
    prefill, verify, compact = _programs(cfg, choices_t, s0, smax)
    cache = mcommon.init_kv_cache(cfg, 1, smax)

    tokens_j = jnp.asarray(np.asarray(prompt, np.int32)[None])
    logits, cache, hidden = prefill(params, cache, tokens_j)
    committed: List[int] = list(prompt)
    next_tok = int(jax.device_get(jnp.argmax(logits[0])))
    t = s0                      # next write slot / absolute position
    stats = MedusaStats()

    hfn = head_logits_fn or (lambda hid, step: head_logits(heads, hid))

    while len(committed) - s0 < max_new_tokens:
        stats.steps += 1
        # draft: per-head top-k candidates fill the tree nodes; heads
        # read the POST-final-norm hidden (reference MedusaForCausalLM
        # applies heads after the transformer's ln_f)
        hn = mcommon.block_norm(cfg, hidden, params["final_norm"])
        hl = hfn(hn, stats.steps)                          # (K, 1, V)
        hl = jnp.asarray(hl)
        cand = [np.asarray(jax.device_get(
            jax.lax.top_k(hl[k, 0], int(tree.topks[k]))[1]))
            for k in range(tree.num_heads)]
        node_tokens = np.array([cand[tree.depths[i] - 1][tree.branch[i]]
                                for i in range(n)], np.int32)
        tree_toks = jnp.asarray(
            np.concatenate([[next_tok], node_tokens])[None])

        logits, new_cache, hidden_all = verify(params, cache, tree_toks, t)
        lg = np.asarray(jax.device_get(jnp.argmax(logits[0], axis=-1)))

        # greedy walk down the tree
        path_slots = [0]                    # accepted slot offsets
        accepted = [next_tok]
        cur = -1                            # current node (-1 = root row 0)
        expect = lg[0]
        while True:
            child = next((i for i in range(n)
                          if tree.parents[i] == cur
                          and node_tokens[i] == expect), None)
            if child is None:
                break
            path_slots.append(child + 1)
            accepted.append(int(node_tokens[child]))
            expect = lg[child + 1]
            cur = child
        bonus = int(expect)                 # argmax at the deepest accepted

        # truncate to the budget
        room = max_new_tokens - (len(committed) - s0)
        accepted = accepted[:room]
        path_slots = path_slots[:len(accepted)]

        pmax = n + 1
        slot_path = np.zeros((pmax,), np.int32)
        slot_path[:len(path_slots)] = path_slots
        cache = compact(new_cache, jnp.asarray(slot_path), t)
        committed.extend(accepted)
        stats.tokens += len(accepted)
        t += len(accepted)
        next_tok = bonus
        hidden = hidden_all[:, path_slots[len(accepted) - 1]]

    return committed, stats
