"""Paged prefill-attention kernel + window/block_pos semantics.

Covers round-1 VERDICT items 2 (paged prefill attention, no cache
materialization) and 9 (sliding-window positions in the paged path via
per-block base positions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.ops import ref
from mixq_tensorrt_llm_tpu.ops.paged_attention import (
    paged_decode_attention, paged_prefill_attention)
from mixq_tensorrt_llm_tpu.quant import core as qcore


def gather_reference(q, k_pages, v_pages, k_scale, v_scale, table,
                     block_pos, q_start, lens, scale, window=0, sink=0):
    """jnp ground truth: gather pages, mask on absolute positions."""
    from mixq_tensorrt_llm_tpu.runtime.kv_cache import paged_gather
    caches = {"k": k_pages, "v": v_pages}
    if k_scale is not None:
        caches.update(k_scale=k_scale, v_scale=v_scale)
    k_all, v_all = paged_gather(caches, table, jnp.float32)
    b, smax = k_all.shape[0], k_all.shape[1]
    bs = k_pages.shape[2]
    c = q.shape[1]
    kv_pos = (np.asarray(block_pos)[:, :, None]
              + np.arange(bs)[None, None, :]).reshape(b, smax)
    qpos = np.asarray(q_start)[:, None] + np.arange(c)[None, :]   # (B, C)
    mask = (kv_pos[:, None, None, :] <= qpos[:, None, :, None]) & \
           (kv_pos[:, None, None, :] < np.asarray(lens)[:, None, None, None])
    if window:
        mask &= (kv_pos[:, None, None, :] > qpos[:, None, :, None] - window) \
            | (kv_pos[:, None, None, :] < sink)
    return ref.attention(q, k_all, v_all, mask=jnp.asarray(mask), scale=scale)


def build(key, b, hkv, d, nb, bs, mb, quantized):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    k = jax.random.normal(ks[1], (nb, hkv, bs, d), jnp.float32)
    v = jax.random.normal(ks[2], (nb, hkv, bs, d), jnp.float32)
    if quantized:
        qk, sk = qcore.quantize_kv(k)
        qv, sv = qcore.quantize_kv(v)
        return qk, qv, sk, sv
    return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), None, None


def seq_tables(b, mb, bs, lens):
    table = np.zeros((b, mb), np.int32)
    bpos = np.full((b, mb), 1 << 30, np.int32)
    nxt = 1
    for i in range(b):
        need = -(-int(lens[i]) // bs)
        for j in range(need):
            table[i, j] = nxt
            bpos[i, j] = j * bs
            nxt += 1
        table[i, need:] = table[i, need - 1]
    return jnp.asarray(table), jnp.asarray(bpos), nxt


class TestPagedPrefill:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_parity_vs_gather(self, quantized):
        """Chunk attention over pages == gathered masked attention."""
        b, hq, hkv, d, nb, bs, mb, c = 2, 4, 2, 64, 12, 16, 4, 32
        lens = jnp.array([40, 56], jnp.int32)       # kv written so far
        q_start = jnp.array([8, 24], jnp.int32)     # chunk starts
        table, bpos, _ = seq_tables(b, mb, bs, lens)
        k, v, sk, sv = build(3, b, hkv, d, nb, bs, mb, quantized)
        q = jax.random.normal(jax.random.PRNGKey(7), (b, c, hq, d),
                              jnp.float32)
        scale = d ** -0.5
        want = gather_reference(q, k, v, sk, sv, table, bpos, q_start, lens,
                                scale)
        got = paged_prefill_attention(q, k, v, sk, sv, table, q_start, lens,
                                      scale, block_pos=bpos, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_sliding_window_and_sink(self):
        b, hq, hkv, d, nb, bs, mb, c = 1, 2, 2, 64, 10, 16, 6, 32
        lens = jnp.array([96], jnp.int32)
        q_start = jnp.array([64], jnp.int32)
        table, bpos, _ = seq_tables(b, mb, bs, lens)
        k, v, sk, sv = build(4, b, hkv, d, nb, bs, mb, False)
        q = jax.random.normal(jax.random.PRNGKey(9), (b, c, hq, d),
                              jnp.float32)
        scale = d ** -0.5
        for window, sink in [(32, 0), (32, 16), (48, 16)]:
            want = gather_reference(q, k, v, sk, sv, table, bpos, q_start,
                                    lens, scale, window=window, sink=sink)
            got = paged_prefill_attention(
                q, k, v, sk, sv, table, q_start, lens, scale,
                block_pos=bpos, window=window, sink=sink, interpret=True)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       rtol=2e-2, atol=2e-2,
                                       err_msg=f"w={window} s={sink}")


class TestDecodeWindowedRecycled:
    def test_recycled_block_pos(self):
        """Decode over a recycled table: entries are position-ordered but
        hold non-contiguous bases; stale positions must not be attended."""
        b, hq, hkv, d, nb, bs = 1, 2, 2, 64, 8, 16
        # window of 2 blocks + 1 sink: after 80 tokens the table is
        # [sink(base 0), blk(base 48), blk(base 64)]
        table = jnp.asarray(np.array([[1, 2, 3]], np.int32))
        bpos = jnp.asarray(np.array([[0, 48, 64]], np.int32))
        lens = jnp.array([76], jnp.int32)
        k, v, sk, sv = build(5, b, hkv, d, nb, bs, 3, True)
        q = jax.random.normal(jax.random.PRNGKey(1), (b, hq, d), jnp.float32)
        scale = d ** -0.5
        window, sink = 32, 16

        got = paged_decode_attention(q, k, v, sk, sv, table, lens, scale,
                                     block_pos=bpos, window=window,
                                     sink=sink, interpret=True)
        want = gather_reference(q[:, None], k, v, sk, sv, table, bpos,
                                lens - 1, lens, scale, window=window,
                                sink=sink)[:, 0]
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_fully_masked_page_contributes_zero(self):
        """A page entirely outside the window must not poison the softmax
        (the exp(NEG_INF - NEG_INF) == 1 hazard)."""
        b, hq, hkv, d, nb, bs = 1, 2, 2, 64, 8, 16
        table = jnp.asarray(np.array([[1, 2, 3]], np.int32))
        bpos = jnp.asarray(np.array([[0, 16, 32]], np.int32))
        lens = jnp.array([48], jnp.int32)
        k, v, sk, sv = build(6, b, hkv, d, nb, bs, 3, False)
        q = jax.random.normal(jax.random.PRNGKey(2), (b, hq, d), jnp.float32)
        scale = d ** -0.5
        # window 16, no sink: only the last page is attendable; pages 0/1
        # are fully masked
        got = paged_decode_attention(q, k, v, sk, sv, table, lens, scale,
                                     block_pos=bpos, window=16, sink=0,
                                     interpret=True)
        want = gather_reference(q[:, None], k, v, sk, sv, table, bpos,
                                lens - 1, lens, scale, window=16,
                                sink=0)[:, 0]
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)
