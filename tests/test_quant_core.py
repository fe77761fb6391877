"""Unit tests for the pure-math quantization core vs float reference.

The reference repo has no unit tests (SURVEY §4); these pin the math so the
Pallas kernels and converters have ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tensorrt_llm_tpu.quant import core as q


def rand(key, *shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


class TestWeightQuant:
    def test_int8_roundtrip_error(self):
        w = rand(0, 256, 128)
        qw, s = q.quantize_weight_int8(w)
        assert qw.dtype == jnp.int8
        deq = q.dequantize_weight(qw, s, dtype=jnp.float32)
        # max error per channel is scale/2
        err = np.abs(np.asarray(deq - w))
        assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-6).all()

    def test_int8_scale_is_absmax_over_127(self):
        w = rand(1, 64, 32)
        s = q.weight_scale_int8(w)
        np.testing.assert_allclose(
            np.asarray(s), np.abs(np.asarray(w)).max(0) / 127.0, rtol=1e-6)

    def test_int8_extremes_map_to_pm127(self):
        w = jnp.zeros((4, 3)).at[0, 0].set(-5.0).at[1, 1].set(3.0).at[2, 2].set(1.0)
        qw, _ = q.quantize_weight_int8(w)
        assert qw[0, 0] == -127 and qw[1, 1] == 127 and qw[2, 2] == 127

    def test_int4_reference_rule(self):
        # scale = absmax/10, clamp [-8,7]: a channel absmax of 10 quantizes
        # to clip(round(10/1), -8, 7) = 7 (intentional saturation).
        w = jnp.array([[10.0], [-10.0], [4.0], [-8.0]])
        qw, s = q.quantize_weight_int4(w)
        np.testing.assert_allclose(np.asarray(s), [1.0])
        assert qw[0, 0] == 7 and qw[1, 0] == -8
        assert qw[2, 0] == 4 and qw[3, 0] == -8

    def test_int4_pack_unpack_roundtrip(self):
        w = rand(2, 128, 64)
        qw, _ = q.quantize_weight_int4(w)
        packed = q.pack_int4(qw)
        assert packed.shape == (64, 64) and packed.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(q.unpack_int4(packed)),
                                      np.asarray(qw))


class TestActivationQuant:
    def test_per_token_scale(self):
        x = rand(3, 8, 512, scale=3.0)
        qx, s = q.quantize_activations(x)
        np.testing.assert_allclose(
            np.asarray(s), np.abs(np.asarray(x)).max(-1) / 127.0, rtol=1e-6)
        assert np.abs(np.asarray(qx)).max() <= 127

    def test_batched_shapes(self):
        x = rand(4, 2, 8, 64)
        qx, s = q.quantize_activations(x)
        assert qx.shape == x.shape and s.shape == (2, 8)

    def test_roundtrip_error(self):
        x = rand(5, 16, 256)
        qx, s = q.quantize_activations(x)
        deq = np.asarray(qx, np.float32) * np.asarray(s)[:, None]
        assert (np.abs(deq - np.asarray(x)) <= np.asarray(s)[:, None] * 0.5 + 1e-6).all()


class TestOutliers:
    def test_select_topk_sorted(self):
        acts = jnp.array([0.1, 9.0, 0.2, 7.0, 0.3, 8.0])
        ind = q.select_outliers(acts, 3)
        np.testing.assert_array_equal(np.asarray(ind), [1, 3, 5])

    def test_extract_and_zero(self):
        x = rand(6, 4, 16)
        ind = jnp.array([2, 7, 11], jnp.int32)
        x_out, x_zeroed = q.extract_outliers_and_zero(x, ind)
        np.testing.assert_allclose(np.asarray(x_out), np.asarray(x)[:, [2, 7, 11]])
        assert (np.asarray(x_zeroed)[:, [2, 7, 11]] == 0).all()
        keep = [i for i in range(16) if i not in (2, 7, 11)]
        np.testing.assert_allclose(np.asarray(x_zeroed)[:, keep],
                                   np.asarray(x)[:, keep])

    def test_mix_artifact_zero_equivalence(self):
        """Core invariant justifying the single-weight design: zeroing the
        activations at outlier channels makes zeroing the weight rows a no-op."""
        w = rand(7, 128, 64)
        acts = jnp.abs(rand(8, 128)) * jnp.arange(128)
        art = q.make_mix_artifact(w, acts, num_outliers=16)
        x = rand(9, 4, 128, scale=2.0)
        _, x_zeroed = q.extract_outliers_and_zero(x, art.fp_ind)
        qx, _ = q.quantize_activations(x_zeroed)
        w_zeroed = art.qweight.at[art.fp_ind].set(0)
        a = jnp.dot(qx.astype(jnp.int32), art.qweight.astype(jnp.int32))
        b = jnp.dot(qx.astype(jnp.int32), w_zeroed.astype(jnp.int32))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestKV:
    def test_kv_roundtrip(self):
        kv = rand(10, 2, 32, 8, 64)  # b, s, h, d
        qkv, s = q.quantize_kv(kv)
        assert qkv.dtype == jnp.int8 and s.shape == (2, 32, 8)
        deq = np.asarray(q.dequantize_kv(qkv, s, dtype=jnp.float32))
        assert np.abs(deq - np.asarray(kv)).max() <= np.asarray(s).max() * 0.51


class TestMixArtifact:
    def test_shapes(self):
        w = rand(11, 256, 96)
        acts = jnp.abs(rand(12, 256))
        art = q.make_mix_artifact(w, acts, num_outliers=32)
        assert art.qweight.shape == (256, 96) and art.qweight.dtype == jnp.int8
        assert art.scale_col.shape == (96,)
        assert art.fp_ind.shape == (32,)
        assert art.fp_weight.shape == (32, 96) and art.fp_weight.dtype == jnp.bfloat16

    def test_int4(self):
        w = rand(13, 64, 32)
        acts = jnp.abs(rand(14, 64))
        art = q.make_mix_artifact(w, acts, num_outliers=8, bits=4)
        assert np.asarray(art.qweight).min() >= -8
        assert np.asarray(art.qweight).max() <= 7
