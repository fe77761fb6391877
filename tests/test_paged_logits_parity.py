"""Dense-vs-paged LOGITS parity across the config matrix.

Round-2 VERDICT weak #1: the paged jnp fallback hardcoded
scale = head_dim**-0.5 and silently dropped attn_logit_softcap
(models/common.py _attention_paged), and the dense int8-KV path
(ops/ref.attention_int8kv) accepted a softcap parameter it never applied.
Token-level greedy tests missed all of it — argmax on random weights is
insensitive. These tests pin allclose-on-LOGITS parity between the dense
forward (ground truth: the masked jnp attention path with the model's true
scale/softcap) and forward_paged, on BOTH data planes:

  * the jnp fallback (use_kernels=False — what multi-device serving ran
    in round 2), and
  * the Pallas kernel path in interpret mode (MIXQ_PAGED_KERNEL=force),
    which now carries the softcap in-kernel so Gemma-2 no longer falls
    off the kernel route.

Reference counterpart for the semantics: Gemma-2 attn_logit_softcapping /
query_pre_attn_scalar (HF Gemma2Attention); the reference TRT stack applies
scale/softcap inside gpt_attention identically in context and generation
phases (tensorrt_llm/functional.py:4475).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig
from mixq_tensorrt_llm_tpu.models import common as mcommon
from mixq_tensorrt_llm_tpu.models.families import init_random_params
from mixq_tensorrt_llm_tpu.quant.config import (QuantConfig,
                                                KVCacheQuantAlgo)
from mixq_tensorrt_llm_tpu.runtime import kv_cache as pkv

BASE = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
            num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
            max_position_embeddings=128)

CONFIGS = {
    # plain llama-lineage GQA — the control row
    "llama_gqa": dict(BASE),
    # Gemma-2 axes: non-default attention scale + logit softcap chosen
    # SMALL (5.0) so tanh actually bends random-weight logits, plus
    # alternating windows and post-block norms
    "gemma2": dict(BASE, arch="gemma2", attn_scale=24 ** -0.5,
                   attn_logit_softcap=5.0, final_logit_softcap=30.0,
                   post_block_norms=True, sliding_window=8,
                   sliding_window_pattern=2,
                   hidden_act="gelu_pytorch_tanh", embed_scale=8.0,
                   tie_word_embeddings=True),
    # softcap + int8 KV: exercises attention_int8kv (dense) and the
    # quantized pool paths (paged)
    "gemma2_int8kv": dict(BASE, attn_scale=24 ** -0.5,
                          attn_logit_softcap=5.0,
                          quant=QuantConfig(kv_cache=KVCacheQuantAlgo.INT8)),
    # Mistral-style static window on every layer
    "windowed": dict(BASE, sliding_window=8),
    # Qwen3 per-head qk-norm with non-default scale
    "qk_norm": dict(BASE, qk_norm=True, attn_scale=0.2),
}


def _build(name):
    cfg = ModelConfig(**CONFIGS[name])
    params = init_random_params(cfg, jax.random.PRNGKey(3))
    return cfg, params


def _dense_logits(cfg, params, tokens, lens):
    """Ground truth: masked jnp attention (full_prefill=False) with the
    model's true scale/softcap, then one decode step."""
    b, s = tokens.shape
    cache = mcommon.init_kv_cache(cfg, b, 64)
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    logits, cache = mcommon.forward(params, cfg, tokens, pos, cache,
                                    jnp.asarray(lens), full_prefill=False)
    last = np.asarray([np.asarray(logits)[i, l - 1] for i, l in
                       enumerate(lens)])
    nxt = jnp.asarray(last.argmax(-1).astype(np.int32))
    dl, _ = mcommon.forward(params, cfg, nxt[:, None],
                            jnp.asarray(lens, jnp.int32)[:, None], cache,
                            jnp.asarray(lens, jnp.int32) + 1)
    return np.asarray(logits), last, np.asarray(dl)[:, 0], nxt


def _paged_logits(cfg, params, tokens, lens, use_kernels):
    b, s = tokens.shape
    bs_blk = 8
    mb = -(-64 // bs_blk)
    bm = pkv.BlockManager(num_blocks=1 + b * mb, block_size=bs_blk)
    state = pkv.init_paged_kv(cfg, bm.num_blocks, bs_blk)
    for i in range(b):
        bm.add_sequence(i, int(lens[i]))
    ids = list(range(b))
    table = jnp.asarray(bm.block_table(ids, mb))
    bpos = jnp.asarray(bm.block_pos(ids, mb))
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    logits, state = mcommon.forward_paged(
        params, cfg, tokens, pos, state, table, jnp.asarray(lens),
        block_pos=bpos, use_kernels=use_kernels)
    last = np.asarray([np.asarray(logits)[i, l - 1] for i, l in
                       enumerate(lens)])
    nxt = jnp.asarray(last.argmax(-1).astype(np.int32))
    for i in range(b):
        bm.extend(i, 1)
    table = jnp.asarray(bm.block_table(ids, mb))
    bpos = jnp.asarray(bm.block_pos(ids, mb))
    dl, _ = mcommon.forward_paged(
        params, cfg, nxt[:, None], jnp.asarray(lens, jnp.int32)[:, None],
        state, table, jnp.asarray(lens, jnp.int32) + 1, block_pos=bpos,
        use_kernels=use_kernels)
    return np.asarray(logits), last, np.asarray(dl)[:, 0], nxt


def _compare(name, use_kernels, prefill_s, tol):
    cfg, params = _build(name)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (2, prefill_s), 1,
                                cfg.vocab_size, jnp.int32)
    lens = np.array([prefill_s, prefill_s - 3], np.int64)
    ref_all, ref_last, ref_dec, ref_tok = _dense_logits(cfg, params,
                                                        tokens, lens)
    got_all, got_last, got_dec, got_tok = _paged_logits(
        cfg, params, tokens, lens, use_kernels)
    # prefill: every VALID position's logits (ragged lens mask padding)
    for i, l in enumerate(lens):
        np.testing.assert_allclose(got_all[i, :l], ref_all[i, :l],
                                    rtol=tol, atol=tol, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(ref_tok))
    # decode step logits
    np.testing.assert_allclose(got_dec, ref_dec, rtol=tol, atol=tol,
                               err_msg=name)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_fallback_logits_match_dense(name):
    """The jnp fallback (the multi-device serving data plane) must agree
    with the dense forward at the LOGITS level — tight tolerance: both
    paths are plain XLA f32 softmax math. int8-KV is looser by nature:
    the dense path attends over raw int8 with scales on the logits
    (ops/ref.attention_int8kv) while the fallback dequantizes the gathered
    pages through bf16 (runtime/kv_cache.paged_gather) — a rounding
    difference of the two exact formulations, not dropped parameters."""
    tol = 1e-2 if "int8kv" in name else 2e-4
    _compare(name, use_kernels=False, prefill_s=12, tol=tol)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_kernel_logits_match_dense(name, monkeypatch):
    """The Pallas kernel route (interpret mode on CPU) must agree with the
    dense forward — including scale and in-kernel softcap. Looser
    tolerance: the kernels run bf16 dots with online softmax."""
    monkeypatch.setenv("MIXQ_PAGED_KERNEL", "force")
    # prefill_s=4 routes through the small-q verify kernel; a second call
    # below exercises the prefill kernel with a longer chunk
    _compare(name, use_kernels=True, prefill_s=4, tol=3e-2)
    _compare(name, use_kernels=True, prefill_s=16, tol=3e-2)
