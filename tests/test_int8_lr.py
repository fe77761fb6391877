"""INT8_LR: W8A8 + rank-r correction of the weight-quantization residual
(MUXQ-style low-rank decomposition, PAPERS.md) — a calibration-free
alternative to the outlier side-GEMM: two dense MXU GEMMs instead of an
activation gather, no act_scales artifact."""


import jax
import jax.numpy as jnp
import numpy as np

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.ops import dispatch, ref
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
from mixq_tensorrt_llm_tpu.quant import core as qcore
from mixq_tensorrt_llm_tpu.runtime import GenerationSession


def test_lr_artifact_reduces_weight_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 96)) * 0.1
    # heavy-tailed columns make plain int8 lossy
    w = w.at[:, :4].mul(20.0)
    q, s, u, v = qcore.make_lr_artifact(w, rank=16)
    deq = q.astype(jnp.float32) * s[None, :]
    corrected = deq + (u.astype(jnp.float32) @ v.astype(jnp.float32))
    e_plain = float(jnp.abs(deq - w).max())
    e_lr = float(jnp.abs(corrected - w).max())
    assert e_lr < e_plain * 0.5, (e_plain, e_lr)


def test_lr_linear_closer_than_w8a8():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (128, 96)) * 0.1
    w = w.at[:, :4].mul(20.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 128))
    want = np.asarray(x @ w)

    params = dispatch.quantize_linear_params(w, QuantAlgo.INT8_LR)
    got = np.asarray(dispatch.linear(params, x, QuantAlgo.INT8_LR),
                     np.float32)
    # plain W8A8 (the same math without the correction)
    q_x, s_row = qcore.quantize_activations(x)
    acc = (q_x.astype(jnp.float32) @ params["qweight"].astype(jnp.float32))
    plain = np.asarray(acc * s_row[:, None] * params["scale_col"][None, :],
                       np.float32)
    err_lr = np.abs(got - want).max()
    err_plain = np.abs(plain - want).max()
    assert err_lr < err_plain


def test_lr_model_forward_and_checkpoint(tmp_path):
    from mixq_tensorrt_llm_tpu.convert.checkpoint import (load_checkpoint,
                                                          save_checkpoint)
    cfg = ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64,
                      quant=QuantConfig(algo=QuantAlgo.INT8_LR))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    assert "lr_u" in params["layers"]["qkv_proj"]
    sess = GenerationSession(params, cfg, max_seq_len=32,
                             prefill_buckets=(8,))
    out = sess.generate([[1, 2, 3]], 6)
    assert len(out.sequences[0]) == 9

    save_checkpoint(str(tmp_path), params, cfg)
    p2, cfg2 = load_checkpoint(str(tmp_path))
    assert cfg2.quant.algo == QuantAlgo.INT8_LR
    out2 = GenerationSession(p2, cfg2, max_seq_len=32,
                             prefill_buckets=(8,)).generate([[1, 2, 3]], 6)
    assert out2.sequences == out.sequences


def test_lr_close_to_float_generation():
    cfg_f = ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                        num_layers=2, num_heads=4, num_kv_heads=2,
                        head_dim=16, max_position_embeddings=64)
    pf = mllama.init_random_params(cfg_f, jax.random.PRNGKey(0))
    base = GenerationSession(pf, cfg_f, max_seq_len=32,
                             prefill_buckets=(8,)).generate(
        [[1, 2, 3]], 8).sequences[0]
    from mixq_tensorrt_llm_tpu.convert.from_float import requantize
    pq, cfg_q = requantize(pf, cfg_f, QuantConfig(algo=QuantAlgo.INT8_LR))
    got = GenerationSession(pq, cfg_q, max_seq_len=32,
                            prefill_buckets=(8,)).generate(
        [[1, 2, 3]], 8).sequences[0]
    assert got[:5] == base[:5]
