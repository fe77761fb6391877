"""Pallas kernel parity tests vs the jnp reference ops (interpret mode on CPU).

Every kernel must match ops.ref bit-for-bit on int outputs and to float
tolerance on float outputs (SURVEY §7 step 2: "Every kernel: parity test
vs jnp reference").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.ops import ref
from mixq_tensorrt_llm_tpu.ops import mixed_matmul as mmk
from mixq_tensorrt_llm_tpu.ops import wo_matmul as wok
from mixq_tensorrt_llm_tpu.ops import norm_quant as nqk
from mixq_tensorrt_llm_tpu.quant import core as qcore


def rand(key, *shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


def make_art(key, k_in, n, ko):
    w = rand(key, k_in, n, scale=0.05)
    acts = jnp.abs(rand(key + 1, k_in)) + 0.1
    return qcore.make_mix_artifact(w, acts, ko)


class TestMixedMatmulKernel:
    @pytest.mark.parametrize("m,k,n,ko", [
        (64, 256, 256, 128),
        (100, 256, 128, 128),    # non-aligned M exercises padding
        (256, 512, 384, 128),    # multi-step K and N grids
    ])
    def test_parity(self, m, k, n, ko):
        art = make_art(10, k, n, ko)
        x = rand(20, m, k, scale=2.0)
        q_x, srow, xout = ref.quant_split(x, art.fp_ind)

        want = ref.mixed_matmul(q_x, srow, xout, art.qweight, art.scale_col,
                                art.fp_weight, out_dtype=jnp.float32)
        got = mmk.mixed_matmul(q_x, srow, xout, art.qweight, art.scale_col,
                               art.fp_weight, out_dtype=jnp.float32,
                               interpret=True, block_m=64, block_n=128,
                               block_k=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    @pytest.mark.parametrize("silu", [False, True])
    def test_hybrid_parity(self, silu):
        m, k, n, ko = 100, 256, 384, 128
        art = make_art(60, k, n, ko)
        x = rand(61, m, k, scale=2.0)
        q_x, srow, xout = ref.quant_split(x, art.fp_ind)
        want = ref.mixed_matmul(q_x, srow, xout, art.qweight, art.scale_col,
                                art.fp_weight, silu=silu,
                                out_dtype=jnp.float32)
        got = mmk.mixed_matmul_hybrid(q_x, srow, xout, art.qweight,
                                      art.scale_col, art.fp_weight,
                                      silu=silu, out_dtype=jnp.float32,
                                      interpret=True, block_m=64,
                                      block_n=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    def test_silu_parity(self):
        m, k, n, ko = 64, 256, 256, 128
        art = make_art(11, k, n, ko)
        x = rand(21, m, k)
        q_x, srow, xout = ref.quant_split(x, art.fp_ind)
        want = ref.mixed_matmul(q_x, srow, xout, art.qweight, art.scale_col,
                                art.fp_weight, silu=True,
                                out_dtype=jnp.float32)
        got = mmk.mixed_matmul(q_x, srow, xout, art.qweight, art.scale_col,
                               art.fp_weight, silu=True,
                               out_dtype=jnp.float32, interpret=True,
                               block_m=64, block_n=128, block_k=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    def test_int_accumulator_exact(self):
        """With unit scales and no outliers the kernel must be bit-exact."""
        m, k, n = 32, 256, 128
        q_x = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 128,
                                 dtype=jnp.int8)
        qw = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 128,
                                dtype=jnp.int8)
        ones_r = jnp.ones((m,), jnp.float32)
        ones_c = jnp.ones((n,), jnp.float32)
        zo = jnp.zeros((m, 128), jnp.bfloat16)
        zw = jnp.zeros((128, n), jnp.bfloat16)
        got = mmk.mixed_matmul(q_x, ones_r, zo, qw, ones_c, zw,
                               out_dtype=jnp.float32, interpret=True,
                               block_m=32, block_n=128, block_k=128)
        want = jnp.dot(q_x.astype(jnp.int32), qw.astype(jnp.int32))
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(want, np.float32))


class TestWoMatmulKernel:
    @pytest.mark.parametrize("m", [1, 4, 100, 256])   # decode + prefill regimes
    def test_parity(self, m):
        k, n = 256, 256
        w = rand(30, k, n, scale=0.05)
        qw, s = qcore.quantize_weight_int8(w)
        x = rand(31, m, k)
        want = ref.wo_matmul(x, qw, s, out_dtype=jnp.float32)
        got = wok.wo_matmul(x, qw, s, out_dtype=jnp.float32, interpret=True,
                            block_m=64, block_n=128, block_k=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    def test_int4_values(self):
        m, k, n = 16, 256, 128
        w = rand(32, k, n, scale=0.05)
        qw, s = qcore.quantize_weight_int4(w)
        x = rand(33, m, k)
        want = ref.wo_matmul(x, qw, s, out_dtype=jnp.float32)
        got = wok.wo_matmul(x, qw, s, out_dtype=jnp.float32, interpret=True,
                            block_m=16, block_n=128, block_k=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


class TestNormQuantKernel:
    @pytest.mark.parametrize("m,k,ko", [(32, 256, 128), (100, 384, 128)])
    def test_rmsnorm_parity(self, m, k, ko):
        x = rand(40, m, k, scale=2.0)
        gamma = jnp.abs(rand(41, k)) + 0.5
        ind = qcore.select_outliers(jnp.abs(rand(42, k)), ko)

        want_q, want_s, want_o = ref.rmsnorm_quant_split(x, gamma, ind)
        got_q, got_s, got_o = nqk.rmsnorm_quant_split(x, gamma, ind,
                                                      interpret=True)
        # int8 codes may differ by 1 ulp at rounding boundaries (f32 order
        # of ops differs); require >=99.9% exact and max delta 1
        diff = np.abs(np.asarray(got_q, np.int32) - np.asarray(want_q, np.int32))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.999
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_o, np.float32),
                                   np.asarray(want_o, np.float32),
                                   rtol=1e-2, atol=1e-2)

    def test_quant_split_no_norm_parity(self):
        m, k, ko = 64, 256, 128
        x = rand(43, m, k, scale=3.0)
        ind = qcore.select_outliers(jnp.abs(rand(44, k)), ko)
        want_q, want_s, want_o = ref.quant_split(x, ind)
        got_q, got_s, got_o = nqk.quant_split(x, ind, interpret=True)
        diff = np.abs(np.asarray(got_q, np.int32) - np.asarray(want_q, np.int32))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.999
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_o, np.float32),
                                   np.asarray(want_o, np.float32),
                                   rtol=1e-2, atol=1e-2)

    def test_batched_shape(self):
        x = rand(45, 2, 8, 256)
        gamma = jnp.ones((256,), jnp.float32)
        ind = jnp.arange(128, dtype=jnp.int32)
        q, s, o = nqk.rmsnorm_quant_split(x, gamma, ind, interpret=True)
        assert q.shape == (2, 8, 256) and s.shape == (2, 8)
        assert o.shape == (2, 8, 128)


class TestEndToEndKernelPath:
    def test_mix_linear_kernel_vs_ref(self):
        m, k, n, ko = 64, 256, 256, 128
        art = make_art(50, k, n, ko)
        x = rand(51, m, k, scale=2.0)
        want = ref.mix_linear(x, art.qweight, art.scale_col, art.fp_ind,
                              art.fp_weight, out_dtype=jnp.float32)
        got = mmk.mix_linear(x, art.qweight, art.scale_col, art.fp_ind,
                             art.fp_weight, out_dtype=jnp.float32,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
