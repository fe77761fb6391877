"""ReDrafter decoding: greedy-exactness and beam acceptance.

Mirrors tests/test_medusa.py's two-fixture design:
- random drafter: acceptance is rare, every step exercises beam-block
  verification + rejection + KV compaction — output must STILL equal
  plain greedy decode.
- oracle draft_fn (beam 0 = the true greedy continuation): the full beam
  must be accepted, so steps drop to ~max_new_tokens / (draft_len + 1) —
  proving the static beam mask and cache compaction commit multiple
  tokens per forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import (KVCacheQuantAlgo, QuantAlgo,
                                         QuantConfig)
from mixq_tensorrt_llm_tpu.runtime import GenerationSession
from mixq_tensorrt_llm_tpu.runtime.redrafter import (beam_search_draft,
                                                     drafter_logits,
                                                     init_random_drafter,
                                                     redrafter_generate)


def tiny(quant=QuantConfig()):
    return ModelConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                       num_layers=2, num_heads=4, num_kv_heads=2,
                       head_dim=16, max_position_embeddings=128,
                       quant=quant)


def greedy_baseline(cfg, params, prompt, n):
    sess = GenerationSession(params, cfg, max_seq_len=len(prompt) + n,
                             prefill_buckets=(len(prompt),),
                             use_flash_prefill=False)
    return sess.generate([list(prompt)], max_new_tokens=n).sequences[0]


def test_beam_search_shapes_and_order():
    cfg = tiny()
    drafter = init_random_drafter(cfg, jax.random.PRNGKey(0), is_rnn=True)
    embed_w = jax.random.normal(jax.random.PRNGKey(1),
                                (cfg.vocab_size, cfg.hidden_size))
    hidden = jax.random.normal(jax.random.PRNGKey(2), (cfg.hidden_size,))
    beams = np.asarray(beam_search_draft(drafter, embed_w, hidden,
                                         jnp.int32(5), 4, 3))
    assert beams.shape == (4, 3)
    assert (beams >= 0).all() and (beams < cfg.vocab_size).all()
    # beam 0 step 0 must be the drafter's argmax continuation of token 5
    x2h = jnp.concatenate(
        [hidden, embed_w[5] @ drafter["rnn_w"]["w"]])
    assert beams[0, 0] == int(jnp.argmax(drafter_logits(drafter, x2h)))


@pytest.mark.parametrize("quant,is_rnn", [
    (QuantConfig(), True),
    (QuantConfig(), False),
    (QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=4,
                 kv_cache=KVCacheQuantAlgo.INT8), True),
])
def test_redrafter_random_drafter_matches_greedy(quant, is_rnn):
    cfg = tiny(quant)
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    drafter = init_random_drafter(cfg, jax.random.PRNGKey(1),
                                  is_rnn=is_rnn)
    prompt = list(range(1, 9))
    n = 10
    want = greedy_baseline(cfg, params, prompt, n)
    got, stats = redrafter_generate(params, cfg, drafter, prompt, n,
                                    num_beams=3, draft_len=3)
    if quant.kv_cache == KVCacheQuantAlgo.INT8:
        # int8-KV softmax reductions differ between the S=1 baseline step
        # and the batched beam verify; near-tie argmaxes on a random tiny
        # model can flip on that noise (same allowance as
        # tests/test_medusa.py). Compare up to the first flip only.
        first = next((i for i, (a, b) in enumerate(zip(got, want))
                      if a != b), len(got))
        assert first >= len(prompt) + 4, (got, want)
    else:
        assert got == want
    assert stats.tokens == n


def test_redrafter_oracle_accepts_full_beams():
    cfg = tiny()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    prompt = list(range(1, 9))
    n = 12
    lc = 3
    want = greedy_baseline(cfg, params, prompt, n + lc + 1)
    gen = want[len(prompt):]

    committed = {"count": 0}

    def oracle(hidden, next_tok, step):
        # beam 0 = the true continuation after next_tok; other beams junk
        start = gen.index(next_tok, committed["count"]) + 1 \
            if next_tok in gen[committed["count"]:] else len(gen)
        row = gen[start:start + lc] + [0] * max(0, lc - len(gen) + start)
        beams = np.zeros((3, lc), np.int32)
        beams[0] = row[:lc]
        committed["count"] = start + lc
        return beams

    got, stats = redrafter_generate(params, cfg, None, prompt, n,
                                    num_beams=3, draft_len=lc,
                                    draft_fn=oracle)
    assert got == want[:len(prompt) + n]
    # full acceptance: lc+1 committed per verify step
    assert stats.steps <= -(-n // (lc + 1)) + 1
    assert stats.tokens_per_step > lc


def test_llm_api_surface():
    from mixq_tensorrt_llm_tpu.api import LLM
    cfg = tiny()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    llm = LLM.__new__(LLM)
    llm.params, llm.cfg, llm.max_seq_len = params, cfg, 64
    drafter = init_random_drafter(cfg, jax.random.PRNGKey(1))
    toks, stats = llm.generate_redrafter(drafter, [1, 2, 3],
                                         max_new_tokens=5, num_beams=2,
                                         draft_len=2)
    assert len(toks) == 8 and stats.tokens == 5


def test_oracle_in_beam1_matches_greedy():
    """Beam 1 (not beam 0) carries the true continuation: its rows sit at
    KV slots offset by draft_len, exercising the slot/position decoupling
    (rope_pos); bit-exactness of off-slot rows is pinned separately by
    test_verify_rows_match_decode_logits."""
    cfg = tiny()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    prompt = list(range(1, 9))
    n, lc = 12, 3
    want = greedy_baseline(cfg, params, prompt, n + lc + 1)
    gen = want[len(prompt):]

    state = {"count": 0}

    def oracle(hidden, next_tok, step):
        start = gen.index(next_tok, state["count"]) + 1 \
            if next_tok in gen[state["count"]:] else len(gen)
        row = gen[start:start + lc] + [0] * max(0, lc - len(gen) + start)
        beams = np.zeros((3, lc), np.int32)
        beams[1] = row[:lc]          # true continuation in beam ONE
        state["count"] = start + lc
        return beams

    got, stats = redrafter_generate(params, cfg, None, prompt, n,
                                    num_beams=3, draft_len=lc,
                                    draft_fn=oracle)
    assert got == want[:len(prompt) + n]
    assert stats.tokens_per_step > lc    # full beam-1 acceptance


def test_verify_rows_match_decode_logits():
    """Verify-style rows written at slots != positions must reproduce the
    plain sequential decode logits EXACTLY — rope must rotate by the TRUE
    position (rope_pos), not the cache slot (the pre-fix behavior drifted
    ~4e-3 per slot of offset and grew with scale)."""
    from mixq_tensorrt_llm_tpu.models import common as mcommon
    cfg = tiny()
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    prompt = np.arange(1, 9, dtype=np.int32)
    s0 = len(prompt)
    cache = mcommon.init_kv_cache(cfg, 1, 32)
    lg, cache = mcommon.forward(
        params, cfg, jnp.asarray(prompt[None]),
        jnp.arange(s0)[None], cache, jnp.full((1,), s0, jnp.int32))
    t0 = int(jnp.argmax(lg[0, -1]))
    toks, truth, c = [t0], [], cache
    for j in range(3):
        lgj, c = mcommon.forward(params, cfg, jnp.asarray([[toks[-1]]]),
                                 jnp.full((1, 1), s0 + j, jnp.int32), c,
                                 jnp.full((1,), s0 + j + 1, jnp.int32))
        truth.append(np.asarray(lgj[0, 0]))
        toks.append(int(np.argmax(truth[-1])))

    rows = jnp.asarray([[t0, toks[1], toks[2]]], jnp.int32)
    slots = jnp.arange(3, dtype=jnp.int32)[None] + s0 + 3   # offset slots
    posr = jnp.arange(3, dtype=jnp.int32)[None] + s0        # true positions
    smax = cache.k.shape[2]
    hist = jnp.arange(smax)[None, None, None, :] < s0
    blk = jnp.tril(jnp.ones((3, 3), bool))
    mask = hist | jnp.zeros((1, 1, 3, smax), bool
                            ).at[:, :, :, s0 + 3:s0 + 6].set(blk)
    out, _ = mcommon.forward(params, cfg, rows, slots, cache,
                             jnp.full((1,), s0 + 6, jnp.int32),
                             attn_mask=mask, rope_pos=posr)
    for j in range(3):
        np.testing.assert_array_equal(np.asarray(out[0, j]), truth[j])


def test_drafter_from_hf_mapping():
    """Synthetic redrafter-format state dict loads into the drafter schema
    and matches the torch drafter forward (input_proj + ResBlocks + head,
    RNN embed)."""
    import torch
    h, v, exit_dim = 16, 32, 24
    torch.manual_seed(0)
    sd = {
        "drafter.input_proj.weight": torch.randn(exit_dim, 2 * h) * 0.1,
        "drafter.input_proj.bias": torch.randn(exit_dim) * 0.1,
        "drafter.layers.0.linear.weight": torch.randn(exit_dim, exit_dim) * 0.1,
        "drafter.layers.0.linear.bias": torch.randn(exit_dim) * 0.1,
        "drafter.lm_head.weight": torch.randn(v, exit_dim) * 0.1,
        "drafter.rnn_w.weight": torch.randn(h, h) * 0.1,
        "drafter.rnn_u.weight": torch.randn(h, h) * 0.1,
        "drafter.rnn_u.bias": torch.randn(h) * 0.1,
    }
    from mixq_tensorrt_llm_tpu.runtime.redrafter import (drafter_from_hf,
                                                         drafter_logits)
    drafter = drafter_from_hf({k: v2.numpy() for k, v2 in sd.items()})
    x = torch.randn(2, 2 * h)
    got = np.asarray(drafter_logits(drafter, jnp.asarray(x.numpy())))
    t = x @ sd["drafter.input_proj.weight"].T + sd["drafter.input_proj.bias"]
    t = t + torch.nn.functional.silu(
        t @ sd["drafter.layers.0.linear.weight"].T
        + sd["drafter.layers.0.linear.bias"])
    want = (t @ sd["drafter.lm_head.weight"].T).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert "rnn_w" in drafter and drafter["rnn_u"]["b"].shape == (h,)
