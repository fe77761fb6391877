"""Paged decode-attention kernel parity vs the gather+mask reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.ops import ref
from mixq_tensorrt_llm_tpu.ops.paged_attention import paged_decode_attention
from mixq_tensorrt_llm_tpu.quant import core as qcore


def reference(q, k_pages, v_pages, k_scale, v_scale, table, lens, scale):
    """Gather pages -> dense masked attention (the jnp path in
    runtime.kv_cache.paged_gather + ops.ref.attention)."""
    caches = {"k": k_pages, "v": v_pages}
    if k_scale is not None:
        caches.update(k_scale=k_scale, v_scale=v_scale)
    from mixq_tensorrt_llm_tpu.runtime.kv_cache import paged_gather
    k_all, v_all = paged_gather(caches, table, jnp.float32)
    smax = k_all.shape[1]
    mask = (jnp.arange(smax)[None, None, None, :] <
            lens[:, None, None, None])
    out = ref.attention(q[:, None], k_all, v_all, mask=mask, scale=scale)
    return out[:, 0]


def build(key, b, hq, hkv, d, nb, bs, mb, lens, quantized):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    q = jax.random.normal(ks[0], (b, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (nb, hkv, bs, d), jnp.float32)
    v = jax.random.normal(ks[2], (nb, hkv, bs, d), jnp.float32)
    # distinct block tables per sequence (use disjoint pages)
    table = np.zeros((b, mb), np.int32)
    nxt = 1
    for i in range(b):
        need = -(-int(lens[i]) // bs)
        for j in range(need):
            table[i, j] = nxt
            nxt += 1
    assert nxt <= nb
    if quantized:
        # pages are (NB, Hkv, BS, D); per-entry scales land (NB, Hkv, BS)
        qk, sk = qcore.quantize_kv(k)
        qv, sv = qcore.quantize_kv(v)
        return q, qk, qv, sk, sv, jnp.asarray(table)
    return q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), None, None, \
        jnp.asarray(table)


class TestPagedDecodeAttention:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_parity_gqa_ragged(self, quantized):
        b, hq, hkv, d, nb, bs, mb = 3, 8, 2, 128, 16, 16, 4
        lens = jnp.array([33, 16, 61], jnp.int32)
        q, k, v, sk, sv, table = build(0, b, hq, hkv, d, nb, bs, mb, lens,
                                       quantized)
        scale = d ** -0.5
        want = reference(q, k, v, sk, sv, table, lens, scale)
        got = paged_decode_attention(q, k, v, sk, sv, table, lens, scale,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_parity_mha_single_block(self):
        b, hq, hkv, d, nb, bs, mb = 2, 4, 4, 128, 8, 32, 2
        lens = jnp.array([5, 32], jnp.int32)
        q, k, v, sk, sv, table = build(1, b, hq, hkv, d, nb, bs, mb, lens,
                                       False)
        scale = d ** -0.5
        want = reference(q, k, v, sk, sv, table, lens, scale)
        got = paged_decode_attention(q, k, v, sk, sv, table, lens, scale,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_length_one(self):
        """A sequence with a single cached token must return ~v[0]."""
        b, hq, hkv, d, nb, bs, mb = 1, 2, 2, 128, 4, 8, 2
        lens = jnp.array([1], jnp.int32)
        q, k, v, sk, sv, table = build(2, b, hq, hkv, d, nb, bs, mb, lens,
                                       False)
        got = paged_decode_attention(q, k, v, sk, sv, table, lens,
                                     d ** -0.5, interpret=True)
        first_block = int(table[0, 0])
        want = np.asarray(v, np.float32)[first_block, :, 0]   # (Hkv, D)
        np.testing.assert_allclose(np.asarray(got[0], np.float32),
                                   np.repeat(want, 1, axis=0), rtol=2e-2,
                                   atol=2e-2)


class TestPagedVerifyAttention:
    """Small-q verify kernel (speculative gamma+1 rows) vs gather+mask."""

    def _reference(self, q, k_pages, v_pages, sk, sv, table, lens, qstart,
                   scale):
        caches = {"k": k_pages, "v": v_pages}
        if sk is not None:
            caches.update(k_scale=sk, v_scale=sv)
        from mixq_tensorrt_llm_tpu.runtime.kv_cache import paged_gather
        k_all, v_all = paged_gather(caches, table, jnp.float32)
        smax = k_all.shape[1]
        s = q.shape[1]
        kv_pos = jnp.arange(smax)[None, None, None, :]
        qpos = (qstart[:, None] + jnp.arange(s)[None, :]
                )[:, None, :, None]
        mask = (kv_pos <= qpos) & (kv_pos < lens[:, None, None, None])
        return ref.attention(q, k_all, v_all, mask=mask, scale=scale)

    @pytest.mark.parametrize("quantized", [False, True])
    def test_parity_vs_gather(self, quantized):
        from mixq_tensorrt_llm_tpu.ops.paged_attention import (
            paged_verify_attention)
        b, s, hq, hkv, d, nb, bs, mb = 2, 5, 8, 2, 128, 16, 16, 4
        lens = jnp.array([33, 17], jnp.int32)      # rows end at lens-1
        qstart = lens - s
        q1, k, v, sk, sv, table = build(3, b, hq, hkv, d, nb, bs, mb, lens,
                                        quantized)
        q = jax.random.normal(jax.random.PRNGKey(9), (b, s, hq, d),
                              jnp.float32)
        scale = d ** -0.5
        want = self._reference(q, k, v, sk, sv, table, lens, qstart, scale)
        got = paged_verify_attention(q, k, v, sk, sv, table, lens, qstart,
                                     scale, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_s1_equals_decode_kernel(self):
        from mixq_tensorrt_llm_tpu.ops.paged_attention import (
            paged_verify_attention)
        b, hq, hkv, d, nb, bs, mb = 2, 4, 2, 128, 8, 16, 3
        lens = jnp.array([9, 30], jnp.int32)
        q, k, v, sk, sv, table = build(4, b, hq, hkv, d, nb, bs, mb, lens,
                                       False)
        a = paged_decode_attention(q, k, v, sk, sv, table, lens, d ** -0.5,
                                   interpret=True)
        bb = paged_verify_attention(q[:, None], k, v, sk, sv, table, lens,
                                    lens - 1, d ** -0.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb[:, 0]))
