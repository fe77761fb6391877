"""Group-wise W4A16 quantization (QuantAlgo.W4A16_G).

Stock TRT-LLM carries W4A16_GPTQ/AWQ group-wise int4; the reference fork
only has per-channel int4 with the absmax/10 rule. Here every
`group_size` input rows share one absmax/7 scale per output channel —
error tracks the group's dynamic range, not the whole channel's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import (ModelConfig, forward,
                                           init_kv_cache, llama as mllama)
from mixq_tensorrt_llm_tpu.ops import dispatch, ref
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
from mixq_tensorrt_llm_tpu.quant import core as qcore


def _row_varying_weight(key, k=256, n=64):
    """Rows span 100x in magnitude: per-channel scales must cover the
    largest row, grouped scales adapt per 32-row band."""
    w = jax.random.normal(key, (k, n), jnp.float32)
    rowscale = jnp.logspace(-2, 0, k)[:, None]
    return w * rowscale


class TestCore:
    def test_roundtrip_shapes_and_range(self):
        w = _row_varying_weight(jax.random.PRNGKey(0))
        q, s = qcore.quantize_weight_int4_grouped(w, group_size=32)
        assert q.shape == w.shape and s.shape == (256 // 32, 64)
        qn = np.asarray(q)
        assert qn.min() >= -7 and qn.max() <= 7
        deq = qcore.dequantize_weight_grouped(q, s, jnp.float32)
        assert float(jnp.abs(deq - w).max()) < float(s.max()) * 0.51

    def test_grouped_beats_per_channel(self):
        w = _row_varying_weight(jax.random.PRNGKey(1))
        qg, sg = qcore.quantize_weight_int4_grouped(w, group_size=32)
        qc, sc = qcore.quantize_weight_int4(w)
        err_g = float(jnp.linalg.norm(
            qcore.dequantize_weight_grouped(qg, sg, jnp.float32) - w))
        err_c = float(jnp.linalg.norm(
            qcore.dequantize_weight(qc, sc, jnp.float32) - w))
        # per-channel int4 uses the reference's saturating absmax/10 rule,
        # which trades clipping for resolution; grouped absmax/7 still wins
        assert err_g < 0.7 * err_c, (err_g, err_c)

    def test_grouped_matmul_matches_dequant_dot(self):
        w = _row_varying_weight(jax.random.PRNGKey(2))
        q, s = qcore.quantize_weight_int4_grouped(w, group_size=32)
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 256), jnp.float32)
        got = ref.wo_matmul_grouped(x, q, s, out_dtype=jnp.float32)
        want = jnp.dot(
            x.astype(jnp.bfloat16),
            qcore.dequantize_weight_grouped(q, s, jnp.bfloat16),
            preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


class TestDispatch:
    def test_packed_matches_unpacked(self):
        w = _row_varying_weight(jax.random.PRNGKey(4))
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 256), jnp.bfloat16)
        p_u = dispatch.quantize_linear_params(w, QuantAlgo.W4A16_G,
                                              group_size=32)
        p_p = dispatch.quantize_linear_params(w, QuantAlgo.W4A16_G,
                                              group_size=32, pack=True)
        assert "scale_g" in p_u and "qweight_packed" in p_p
        a = dispatch.linear(p_u, x, QuantAlgo.W4A16_G)
        b = dispatch.linear(p_p, x, QuantAlgo.W4A16_G)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _tiny(quant=QuantConfig()):
    return ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       head_dim=16, max_position_embeddings=64, quant=quant)


class TestModel:
    def test_generate_and_accuracy_vs_per_channel(self):
        """The same random float model quantized w4a16_g tracks the float
        logits tighter than per-channel w4a16."""
        from mixq_tensorrt_llm_tpu.convert.from_float import requantize
        cfg_f = _tiny()
        params_f = mllama.init_random_params(cfg_f, jax.random.PRNGKey(0))
        toks = jnp.arange(1, 9, dtype=jnp.int32)[None, :]
        pos = jnp.arange(8, dtype=jnp.int32)[None, :]
        lens = jnp.array([8], jnp.int32)

        def logits(params, cfg):
            cache = init_kv_cache(cfg, 1, 16)
            out, _ = forward(params, cfg, toks, pos, cache, lens)
            return out.astype(jnp.float32)

        want = logits(params_f, cfg_f)
        errs = {}
        for name, algo in (("g", QuantAlgo.W4A16_G), ("c", QuantAlgo.W4A16)):
            qcfg = QuantConfig(algo=algo, group_size=32)
            params_q, cfg_q = requantize(params_f, cfg_f, qcfg)
            errs[name] = float(jnp.linalg.norm(logits(params_q, cfg_q)
                                               - want))
        assert errs["g"] <= errs["c"], errs

        from mixq_tensorrt_llm_tpu.runtime import GenerationSession
        qcfg = QuantConfig(algo=QuantAlgo.W4A16_G, group_size=32)
        params_q, cfg_q = requantize(params_f, cfg_f, qcfg)
        sess = GenerationSession(params_q, cfg_q, max_seq_len=32,
                                 prefill_buckets=(8,))
        out = sess.generate([[1, 2, 3]], 6).sequences[0]
        assert len(out) == 9

    def test_checkpoint_roundtrip(self, tmp_path):
        from mixq_tensorrt_llm_tpu.convert.checkpoint import (
            load_checkpoint, save_checkpoint)
        cfg = _tiny(QuantConfig(algo=QuantAlgo.W4A16_G, group_size=32))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        save_checkpoint(str(tmp_path / "ck"), params, cfg)
        p2, cfg2 = load_checkpoint(str(tmp_path / "ck"))
        assert cfg2.quant.algo == QuantAlgo.W4A16_G
        assert cfg2.quant.group_size == 32
        s1 = params["layers"]["qkv_proj"]["scale_g"]
        np.testing.assert_array_equal(
            np.asarray(s1), np.asarray(p2["layers"]["qkv_proj"]["scale_g"]))


class TestPackedGroupedKernel:
    @pytest.mark.parametrize("gs,block_k", [(32, 64), (32, 512), (64, 64)])
    def test_kernel_matches_ref(self, gs, block_k):
        """Interpret-mode Pallas grouped packed kernel == grouped ref."""
        k, n, m = 256, 128, 8
        w = _row_varying_weight(jax.random.PRNGKey(7), k, n)
        q, s = qcore.quantize_weight_int4_grouped(w, group_size=gs)
        packed = qcore.pack_int4(q)
        x = jax.random.normal(jax.random.PRNGKey(8), (m, k), jnp.float32)

        from mixq_tensorrt_llm_tpu.ops.wo_matmul import \
            wo_matmul_packed_grouped
        got = wo_matmul_packed_grouped(x.astype(jnp.bfloat16), packed, s,
                                       gs, out_dtype=jnp.float32,
                                       interpret=True, block_k=block_k)
        want = ref.wo_matmul_grouped(x, q, s, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    def test_odd_m_padding(self):
        k, n, gs = 128, 128, 32
        w = _row_varying_weight(jax.random.PRNGKey(9), k, n)
        q, s = qcore.quantize_weight_int4_grouped(w, group_size=gs)
        from mixq_tensorrt_llm_tpu.ops.wo_matmul import \
            wo_matmul_packed_grouped
        x = jax.random.normal(jax.random.PRNGKey(10), (3, k), jnp.float32)
        got = wo_matmul_packed_grouped(x.astype(jnp.bfloat16),
                                       qcore.pack_int4(q), s, gs,
                                       out_dtype=jnp.float32,
                                       interpret=True)
        assert got.shape == (3, n)
        want = ref.wo_matmul_grouped(x, q, s, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)
