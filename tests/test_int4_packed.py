"""Packed-int4 weight-only kernel: nibbles split in VMEM (VERDICT r1 item 6).

Reference behavior: dequantize_s4_to_fp16x2 inside the GEMM
(kernel/i8gemm.cu:306-369) — packed weights are the only weight HBM
traffic. Here: quant.core.pack_int4 K-half layout + ops.wo_matmul_packed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tensorrt_llm_tpu.ops import ref
from mixq_tensorrt_llm_tpu.ops.wo_matmul import wo_matmul_packed
from mixq_tensorrt_llm_tpu.quant import core as qcore


def test_pack_khalf_roundtrip():
    k, n = 64, 32
    qw = jax.random.randint(jax.random.PRNGKey(0), (k, n), -8, 8, jnp.int8)
    packed = qcore.pack_int4(qw)
    assert packed.shape == (k // 2, n)
    np.testing.assert_array_equal(np.asarray(qcore.unpack_int4(packed)),
                                  np.asarray(qw))


def test_wo_matmul_packed_parity():
    """Packed kernel == unpack + reference wo matmul."""
    m, k, n = 5, 256, 128
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(keys[0], (m, k), jnp.bfloat16)
    qw = jax.random.randint(keys[1], (k, n), -8, 8, jnp.int8)
    scol = jnp.abs(jax.random.normal(keys[2], (n,), jnp.float32)) + 0.05
    packed = qcore.pack_int4(qw)

    want = ref.wo_matmul(x, qw, scol, out_dtype=jnp.float32)
    got = wo_matmul_packed(x, packed, scol, out_dtype=jnp.float32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_packed_model_logits_match_unpacked():
    """End-to-end: a W4A16 model with packed storage matches the unpacked
    one through the dispatch layer (ref backend on CPU)."""
    from mixq_tensorrt_llm_tpu.ops import dispatch
    from mixq_tensorrt_llm_tpu.quant.config import QuantAlgo

    k, n = 128, 64
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    w = jax.random.normal(keys[0], (k, n), jnp.float32) * 0.1
    x = jax.random.normal(keys[1], (3, k), jnp.bfloat16)

    plain = dispatch.quantize_linear_params(w, QuantAlgo.W4A16, pack=False)
    packed = dispatch.quantize_linear_params(w, QuantAlgo.W4A16, pack=True)
    a = dispatch.linear(plain, x, QuantAlgo.W4A16)
    b = dispatch.linear(packed, x, QuantAlgo.W4A16)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), rtol=1e-2,
                               atol=1e-2)
