"""Attention dispatch: Pallas flash attention for prefill, masked reference
for decode/chunked regimes.

Replaces the reference's gpt_attention plugin surface (context FMHA +
masked MHA fallback, tensorrt_llm/functional.py:4475 + binary plugin libs):
full-prefill causal self-attention runs the Pallas flash kernel (no S x S
logits materialization); the general cache-attend path (decode steps,
chunked prefill) uses the masked reference einsum, which a paged int8-KV
Pallas decode kernel will replace.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ref
from ._util import resolve_interpret


def _flash_available(s: int, d: int) -> bool:
    # stock kernel wants q_len divisible by its block size; use it for the
    # shapes where it wins clearly and the tiling is clean
    return s >= 128 and s % 128 == 0 and d in (64, 128, 256)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def causal_self_attention(q, k, v, scale: float, interpret=None):
    """Full causal self-attention. q (B,S,Hq,D), k/v (B,S,Hkv,D) ->
    (B,S,Hq,D). GQA via kv-head repetition."""
    interpret = resolve_interpret(interpret)
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    if interpret or not _flash_available(s, d):
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        return ref.attention(q, k, v, mask=mask, scale=scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes)
    if hkv != hq:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # 512x512 blocks measured 3x faster than the kernel's 128 defaults on
    # the target chip (tools/kernel probes)
    bq = bkv = min(512, s)
    bs_cfg = BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv, block_k_dkv=bkv,
        block_q_dkv=bq, block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq)
    # kernel layout is (B, H, S, D)
    out = flash_attention(
        q.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
        k.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
        v.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
        causal=True, sm_scale=scale, block_sizes=bs_cfg)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
