"""Perplexity evaluation (WikiText-2 style block PPL).

Replaces the reference's Perplexity harness
(MixQ/src/utils/utils/perplexity_utils.py:10, evalppl.py / benchppl.py and
tensorrt_llm/tools/ppl.py): the token stream is concatenated, cut into
fixed-length blocks, and scored with teacher forcing; PPL =
exp(total_nll / total_tokens). Block scoring is batched and jitted — this
is the exact workload behind the reference's headline it/s numbers
(README.md:7-30).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import common as mcommon
from ..models.common import ModelConfig


@dataclasses.dataclass
class PPLResult:
    ppl: float
    total_tokens: int
    total_nll: float
    blocks: int
    elapsed_s: float

    @property
    def blocks_per_s(self) -> float:
        return self.blocks / self.elapsed_s if self.elapsed_s else 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.total_tokens / self.elapsed_s if self.elapsed_s else 0.0


def _nll_fn(cfg: ModelConfig, full_prefill: bool = True):
    @jax.jit
    def block_nll(params, tokens):
        """tokens (B, S): teacher-forced sum NLL over positions 1..S-1."""
        b, s = tokens.shape
        cache = mcommon.init_kv_cache(cfg, b, s)
        pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
        lens = jnp.full((b,), s, jnp.int32)
        logits, _ = mcommon.forward(params, cfg, tokens, pos, cache, lens,
                                    full_prefill=full_prefill)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.sum()

    return block_nll


def evaluate_ppl(params, cfg: ModelConfig, token_stream: Sequence[int],
                 seq_len: int = 512, batch_size: int = 8,
                 max_blocks: Optional[int] = None,
                 full_prefill: bool = True) -> PPLResult:
    """Block perplexity over a flat token stream.

    full_prefill=True scores with attention over fresh k/v (fastest);
    full_prefill=False attends THROUGH the kv cache, which is the only way
    the kv-cache quantization error reaches the score — use it when gating
    KVCacheQuantAlgo.INT8 (the reference's int8_kv_cache ppl runs read the
    quantized cache the same way)."""
    toks = np.asarray(token_stream, np.int32)
    n_blocks = len(toks) // seq_len
    if max_blocks:
        n_blocks = min(n_blocks, max_blocks)
    assert n_blocks > 0, "token stream shorter than one block"
    blocks = toks[: n_blocks * seq_len].reshape(n_blocks, seq_len)

    block_nll = _nll_fn(cfg, full_prefill)
    total_nll = 0.0
    t0 = time.perf_counter()
    pending = []
    for i in range(0, n_blocks, batch_size):
        chunk = blocks[i: i + batch_size]
        if chunk.shape[0] < batch_size:
            # pad the final batch with zero rows; zero rows are identical and
            # independent, so their NLL contribution subtracts out exactly
            pad = batch_size - chunk.shape[0]
            nll_full = block_nll(params, jnp.asarray(
                np.concatenate([chunk, np.zeros((pad, seq_len), np.int32)])))
            per_zero_row = block_nll(params, jnp.asarray(
                np.zeros((batch_size, seq_len), np.int32))) / batch_size
            pending.append(nll_full - per_zero_row * pad)
        else:
            pending.append(block_nll(params, jnp.asarray(chunk)))
    total_nll = float(sum(float(x) for x in pending))
    elapsed = time.perf_counter() - t0

    total_tokens = n_blocks * (seq_len - 1)
    return PPLResult(
        ppl=float(np.exp(total_nll / total_tokens)),
        total_tokens=total_tokens,
        total_nll=total_nll,
        blocks=n_blocks,
        elapsed_s=elapsed,
    )


def tokenize_corpus(texts: Iterable[str], tokenizer) -> List[int]:
    """Concatenate texts into one token stream (wikitext2 convention:
    '\n\n'.join of raw rows)."""
    joined = "\n\n".join(texts)
    return tokenizer(joined, add_special_tokens=False)["input_ids"]
