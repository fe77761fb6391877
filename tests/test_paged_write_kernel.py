"""Aliased paged-write kernel parity vs the dynamic_update_slice path.

The kernel exists purely so the decode step's pool write is a custom call
with input_output_aliases (a DUS next to the Pallas attention read makes
XLA copy-protect the whole scan-carried pool every layer — see
ops/paged_write.py); numerically it must match _paged_write_decode exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.ops.paged_write import paged_write_token
from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.runtime.kv_cache import _paged_write_decode


def build_pools(key, np_, h, bs, d, quantized):
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    k = jax.random.normal(ks[0], (np_, h, bs, d), jnp.float32)
    v = jax.random.normal(ks[1], (np_, h, bs, d), jnp.float32)
    if quantized:
        qk, sk = qcore.quantize_kv(k)
        qv, sv = qcore.quantize_kv(v)
        return {"k": qk, "v": qv, "k_scale": sk, "v_scale": sv}
    return {"k": k.astype(jnp.bfloat16), "v": v.astype(jnp.bfloat16)}


class TestPagedWriteToken:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_parity_vs_dus(self, quantized):
        np_, h, bs, d, b = 7, 4, 16, 128, 3
        pools = build_pools(0, np_, h, bs, d, quantized)
        pg = jnp.array([2, 5, 1], jnp.int32)
        off = jnp.array([0, 7, 15], jnp.int32)
        ks = jax.random.split(jax.random.PRNGKey(1), 2)
        new_k = jax.random.normal(ks[0], (b, h, d), jnp.float32)
        new_v = jax.random.normal(ks[1], (b, h, d), jnp.float32)

        want = _paged_write_decode(dict(pools), pg, off,
                                   new_k, new_v, quantized)
        got = paged_write_token(dict(pools), pg, off, new_k, new_v,
                                interpret=True)
        assert set(got) == set(want)
        for name in want:
            np.testing.assert_array_equal(np.asarray(got[name]),
                                          np.asarray(want[name]),
                                          err_msg=name)

    def test_untouched_pages_preserved(self):
        np_, h, bs, d, b = 5, 2, 8, 128, 2
        pools = build_pools(2, np_, h, bs, d, True)
        before = {n: np.asarray(a).copy() for n, a in pools.items()}
        pg = jnp.array([3, 3], jnp.int32)       # same trash page twice
        off = jnp.array([1, 2], jnp.int32)
        new_k = jnp.ones((b, h, d), jnp.float32)
        new_v = jnp.ones((b, h, d), jnp.float32)
        got = paged_write_token(dict(pools), pg, off, new_k, new_v,
                                interpret=True)
        for name in before:
            g = np.asarray(got[name])
            # every page except 3 is bit-identical
            mask = np.arange(np_) != 3
            np.testing.assert_array_equal(g[mask], before[name][mask],
                                          err_msg=name)
        # same-page collisions are last-writer-wins (each grid step RMWs
        # from the original buffer): only lane 1's token is guaranteed.
        # Real lanes never share a page — collisions only happen on the
        # trash page (masked writes), where the content is garbage anyway.
        qk, sk = qcore.quantize_kv(new_k)
        np.testing.assert_array_equal(np.asarray(got["k"])[3, :, 2],
                                      np.asarray(qk[1]))


class TestPagedWriteChunk:
    """Chunk (prefill) variant: parity vs the XLA scatter path on every
    real page; trash-page content is unspecified in both paths."""

    @pytest.mark.parametrize("quantized", [False, True])
    def test_parity_vs_scatter(self, quantized):
        from mixq_tensorrt_llm_tpu.ops.paged_write import paged_write_chunk
        np_, h, bs, d, b, s = 9, 4, 128, 128, 2, 256
        pools = build_pools(3, np_, h, bs, d, quantized)
        # lane 0 writes a full aligned chunk into pages 4 then 7; lane 1's
        # chunk is half valid (last 128 tokens trash-masked -> page 0)
        blk = np.zeros((b, s), np.int32)
        blk[0, :128] = 4
        blk[0, 128:] = 7
        blk[1, :128] = 2
        off = np.tile(np.arange(s) % bs, (b, 1)).astype(np.int32)
        ks = jax.random.split(jax.random.PRNGKey(5), 2)
        new_k = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
        new_v = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)

        blk_j, off_j = jnp.asarray(blk), jnp.asarray(off)
        if quantized:
            qk, sk = qcore.quantize_kv(new_k)
            qv, sv = qcore.quantize_kv(new_v)
            want = {
                "k": pools["k"].at[blk_j, :, off_j].set(qk),
                "v": pools["v"].at[blk_j, :, off_j].set(qv),
                "k_scale": pools["k_scale"].at[blk_j, :, off_j].set(sk),
                "v_scale": pools["v_scale"].at[blk_j, :, off_j].set(sv),
            }
        else:
            want = {
                "k": pools["k"].at[blk_j, :, off_j].set(
                    new_k.astype(pools["k"].dtype)),
                "v": pools["v"].at[blk_j, :, off_j].set(
                    new_v.astype(pools["v"].dtype)),
            }
        got = paged_write_chunk(dict(pools), blk_j, off_j, new_k, new_v,
                                interpret=True)
        real = np.arange(np_) != 0
        for name in want:
            np.testing.assert_array_equal(
                np.asarray(got[name])[real], np.asarray(want[name])[real],
                err_msg=name)

    def test_misaligned_tokens_dropped_not_corrupted(self):
        from mixq_tensorrt_llm_tpu.ops.paged_write import paged_write_chunk
        np_, h, bs, d, b, s = 5, 2, 128, 128, 1, 128
        pools = build_pools(4, np_, h, bs, d, True)
        before = {n: np.asarray(a).copy() for n, a in pools.items()}
        blk = np.full((b, s), 3, np.int32)
        # off shifted by one: no token sits at its slab slot
        off = (np.tile(np.arange(s), (b, 1)) + 1) % bs
        got = paged_write_chunk(dict(pools), jnp.asarray(blk),
                                jnp.asarray(off),
                                jnp.ones((b, s, h, d), jnp.float32),
                                jnp.ones((b, s, h, d), jnp.float32),
                                interpret=True)
        for name in before:
            np.testing.assert_array_equal(np.asarray(got[name]),
                                          before[name], err_msg=name)
