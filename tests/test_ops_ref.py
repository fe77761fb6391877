"""Reference-op semantics tests: mixed matmul vs unquantized float GEMM.

Validates that the W8A8O16 recipe reconstructs the float result to within
quantization error, and that fusions (rmsnorm_quant_split, silu) match their
unfused compositions exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tensorrt_llm_tpu.ops import ref
from mixq_tensorrt_llm_tpu.quant import core as q


def rand(key, *shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def make_outlier_input(key, m, n, ind, outlier_scale=30.0):
    """Activations with genuinely large values on the outlier channels."""
    x = rand(key, m, n)
    boost = jnp.zeros((n,)).at[jnp.asarray(ind)].set(outlier_scale)
    return x * (1.0 + boost)


class TestMixedMatmul:
    def test_close_to_float_gemm(self):
        m, k_in, n, k_out = 32, 256, 128, 16
        w = rand(0, k_in, n, scale=0.05)
        act_absmax = jnp.abs(rand(1, k_in)) + 0.1
        ind = q.select_outliers(act_absmax * (1 + 100 * (jnp.arange(k_in) < k_out)), k_out)
        art = q.make_mix_artifact(w, act_absmax.at[ind].mul(100.0), k_out)
        x = make_outlier_input(2, m, k_in, art.fp_ind)

        got = ref.mix_linear(x, art.qweight, art.scale_col, art.fp_ind,
                             art.fp_weight, out_dtype=jnp.float32)
        want = jnp.dot(x, w)
        # int8 error bound: ~||x||*scale; empirical rel err should be small
        rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
        assert rel < 0.02, rel

    def test_outliers_carry_large_channels_exactly(self):
        """Without the outlier path, huge channels destroy int8 accuracy;
        with it, accuracy is restored — the core MixQ claim."""
        m, k_in, n = 16, 128, 64
        w = rand(3, k_in, n, scale=0.1)
        act_absmax = jnp.ones((k_in,)).at[:8].set(1000.0)
        art = q.make_mix_artifact(w, act_absmax, num_outliers=8)
        x = make_outlier_input(4, m, k_in, art.fp_ind, outlier_scale=300.0)
        want = jnp.dot(x, w)

        got_mix = ref.mix_linear(x, art.qweight, art.scale_col, art.fp_ind,
                                 art.fp_weight, out_dtype=jnp.float32)
        # naive: quantize x without outlier split
        qx, srow = q.quantize_activations(x)
        got_naive = ref.mixed_matmul(qx, srow, jnp.zeros((m, 8), jnp.bfloat16),
                                     art.qweight, art.scale_col,
                                     jnp.zeros((8, n), jnp.bfloat16),
                                     out_dtype=jnp.float32)
        rel_mix = np.linalg.norm(np.asarray(got_mix - want)) / np.linalg.norm(np.asarray(want))
        rel_naive = np.linalg.norm(np.asarray(got_naive - want)) / np.linalg.norm(np.asarray(want))
        assert rel_mix < 0.02
        assert rel_naive > 5 * rel_mix  # outlier path must matter

    def test_silu_fusion_matches_unfused(self):
        m, k_in, n = 8, 64, 32
        w = rand(5, k_in, n, scale=0.1)
        art = q.make_mix_artifact(w, jnp.abs(rand(6, k_in)), 8)
        x = rand(7, m, k_in)
        fused = ref.mix_linear(x, art.qweight, art.scale_col, art.fp_ind,
                               art.fp_weight, silu=True, out_dtype=jnp.float32)
        unfused = ref.mix_linear(x, art.qweight, art.scale_col, art.fp_ind,
                                 art.fp_weight, silu=False, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(fused),
                                   np.asarray(jax.nn.silu(unfused)),
                                   rtol=2e-5, atol=2e-5)


class TestWeightOnly:
    def test_w8a16_close_to_float(self):
        m, k_in, n = 4, 256, 128  # decode-regime m
        w = rand(8, k_in, n, scale=0.05)
        qw, s = q.quantize_weight_int8(w)
        x = rand(9, m, k_in)
        got = ref.wo_matmul(x, qw, s, out_dtype=jnp.float32)
        want = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
        assert rel < 0.01, rel

    def test_w4a16(self):
        m, k_in, n = 4, 128, 64
        w = rand(10, k_in, n, scale=0.05)
        qw, s = q.quantize_weight_int4(w)
        x = rand(11, m, k_in)
        got = ref.wo_matmul(x, qw, s, out_dtype=jnp.float32)
        want = jnp.dot(x, w)
        # the reference int4 rule (absmax/10, clamp [-8,7]) saturates the
        # tail of the weight distribution, so error is inherently larger
        rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
        assert rel < 0.2, rel


class TestFusedNorm:
    def test_rmsnorm_quant_split_matches_composition(self):
        b, n = 16, 128
        x = rand(12, b, n, scale=2.0)
        gamma = jnp.abs(rand(13, n)) + 0.5
        ind = jnp.array([3, 50, 77, 100], jnp.int32)
        q_x, srow, x_out = ref.rmsnorm_quant_split(x, gamma, ind)

        normed = ref.rmsnorm(x, gamma)
        xo, xz = q.extract_outliers_and_zero(normed, ind)
        want_q, want_s = q.quantize_activations(xz)
        np.testing.assert_array_equal(np.asarray(q_x), np.asarray(want_q))
        np.testing.assert_allclose(np.asarray(srow), np.asarray(want_s), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(x_out, jnp.float32),
                                   np.asarray(xo.astype(jnp.bfloat16), jnp.float32))


class TestAttention:
    def test_gqa_matches_mha_with_repeat(self):
        b, sq, skv, hq, hkv, d = 2, 8, 8, 8, 2, 32
        key = jax.random.PRNGKey(14)
        ks = jax.random.split(key, 3)
        qq = jax.random.normal(ks[0], (b, sq, hq, d))
        kk = jax.random.normal(ks[1], (b, skv, hkv, d))
        vv = jax.random.normal(ks[2], (b, skv, hkv, d))
        got = ref.attention(qq, kk, vv)
        want = ref.attention(qq, jnp.repeat(kk, 4, axis=2), jnp.repeat(vv, 4, axis=2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_causal_mask(self):
        b, s, h, d = 1, 6, 2, 16
        key = jax.random.PRNGKey(15)
        ks = jax.random.split(key, 3)
        qq, kk, vv = (jax.random.normal(k, (b, s, h, d)) for k in ks)
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        got = ref.attention(qq, kk, vv, mask=mask)
        # position 0 attends only to itself
        want0 = np.asarray(vv)[:, 0]
        np.testing.assert_allclose(np.asarray(got)[:, 0], want0, rtol=1e-5, atol=1e-5)


class TestAttentionInt8KV:
    def test_matches_dequantized_attention(self):
        import jax
        from mixq_tensorrt_llm_tpu.quant import core as qcore
        b, sq, skv, hq, hkv, d = 2, 3, 16, 8, 2, 16
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, sq, hq, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, skv, hkv, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, skv, hkv, d), jnp.float32)
        kq, kscale = qcore.quantize_kv(k)
        vq, vscale = qcore.quantize_kv(v)
        mask = (jnp.arange(skv)[None, None, None, :]
                <= (jnp.arange(sq) + skv - sq)[None, None, :, None])
        bias = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, hq, 1, skv), jnp.float32) * 0.1
        want = ref.attention(q, qcore.dequantize_kv(kq, kscale, jnp.float32),
                             qcore.dequantize_kv(vq, vscale, jnp.float32),
                             mask=mask, bias=bias)
        got = ref.attention_int8kv(q, kq, kscale, vq, vscale, mask=mask,
                                   bias=bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
