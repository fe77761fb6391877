"""Speculative decoding: output equals target-greedy; stats sane; the
stochastic accept/resample rule preserves the target distribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
from mixq_tensorrt_llm_tpu.runtime import GenerationSession
from mixq_tensorrt_llm_tpu.runtime.speculative import (
    _accept_resample, speculative_generate, speculative_generate_batched)


def cfg_of(layers, seed_unused=0):
    return ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_layers=layers, num_heads=4, num_kv_heads=2,
                       head_dim=16, max_position_embeddings=128,
                       quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4))


@pytest.fixture(scope="module")
def models():
    tcfg = cfg_of(3)
    tparams = mllama.init_random_params(tcfg, jax.random.PRNGKey(0))
    dcfg = cfg_of(1)
    dparams = mllama.init_random_params(dcfg, jax.random.PRNGKey(1))
    return tparams, tcfg, dparams, dcfg


def target_greedy(tparams, tcfg, prompt, n):
    sess = GenerationSession(tparams, tcfg, max_seq_len=64,
                             prefill_buckets=(8,), use_flash_prefill=False)
    return sess.generate([prompt], max_new_tokens=n).sequences[0]


class TestSpeculative:
    def test_output_equals_target_greedy(self, models):
        tparams, tcfg, dparams, dcfg = models
        prompt = [1, 2, 3, 4]
        want = target_greedy(tparams, tcfg, prompt, 10)
        got, stats = speculative_generate(tparams, tcfg, dparams, dcfg,
                                          prompt, 10, gamma=3,
                                          max_seq_len=64)
        assert got == want
        assert stats.proposed > 0
        assert 0.0 <= stats.acceptance_rate <= 1.0

    def test_self_draft_accepts_everything(self, models):
        """Draft == target -> near-total acceptance; output may differ from
        step-by-step greedy only at bf16 logit near-ties (batched verify vs
        single-token decode round differently), so compare loosely."""
        tparams, tcfg, _, _ = models
        prompt = [9, 8, 7]
        want = target_greedy(tparams, tcfg, prompt, 8)
        got, stats = speculative_generate(tparams, tcfg, tparams, tcfg,
                                          prompt, 8, gamma=4,
                                          max_seq_len=64)
        assert len(got) == len(want)
        mism = sum(a != b for a, b in zip(got, want))
        assert mism <= 1, (got, want)
        assert stats.acceptance_rate > 0.7, stats

    def test_eos_stops(self, models):
        tparams, tcfg, dparams, dcfg = models
        base = target_greedy(tparams, tcfg, [1, 2], 8)
        eos = base[4]   # a token that will be generated
        got, _ = speculative_generate(tparams, tcfg, dparams, dcfg,
                                      [1, 2], 8, gamma=3, eos_token_id=eos,
                                      max_seq_len=64)
        assert got[-1] == eos or len(got) - 2 == 8
        assert eos not in got[2:-1]


class TestAcceptResample:
    def test_output_distribution_equals_target(self):
        """Monte Carlo check of the Leviathan rule: the marginal of the
        FIRST emitted token (draft x_1 if accepted, else the residual
        resample) must equal the target's p_0 for arbitrary p != q."""
        v, g, trials = 8, 3, 200_000
        kp, kq, kt = jax.random.split(jax.random.PRNGKey(0), 3)
        p = jax.nn.softmax(jax.random.normal(kp, (g + 1, v)) * 1.5)
        q = jax.nn.softmax(jax.random.normal(kq, (g, v)) * 1.5)

        def one(key):
            kd, ka = jax.random.split(key)
            # draft samples x_j ~ q_j (independent per slot: the chain
            # structure doesn't matter for the slot-0 marginal)
            toks = jax.random.categorical(kd, jnp.log(q)[None], axis=-1)
            n, extra = _accept_resample(p[None], q[None], toks, ka)
            return jnp.where(n[0] >= 1, toks[0, 0], extra[0])

        outs = jax.vmap(one)(jax.random.split(kt, trials))
        hist = np.bincount(np.asarray(outs), minlength=v) / trials
        np.testing.assert_allclose(hist, np.asarray(p[0]), atol=6e-3)

    def test_identical_dists_accept_all(self):
        v, g, b = 16, 4, 64
        kp, kd, ka = jax.random.split(jax.random.PRNGKey(1), 3)
        p_row = jax.nn.softmax(jax.random.normal(kp, (v,)))
        p = jnp.broadcast_to(p_row, (b, g + 1, v))
        q = jnp.broadcast_to(p_row, (b, g, v))
        toks = jax.random.categorical(kd, jnp.log(q), axis=-1)
        n, _ = _accept_resample(p, q, toks, ka)
        assert int(n.min()) == g   # p == q -> ratio 1 -> always accept


class TestBatchedSpeculative:
    def test_greedy_matches_target(self, models):
        """Greedy batched speculative == target-only greedy, except where
        the target's top-2 logits are a bf16 near-tie (multi-token verify
        and single-token decode round such ties differently; the reference
        context-vs-gen phases have the same property). Every divergence
        must be provably a near-tie under a full-context forward."""
        from mixq_tensorrt_llm_tpu.models import common as mcommon

        tparams, tcfg, dparams, dcfg = models
        prompts = [[1, 2, 3, 4], [9, 8, 7]]
        outs, stats = speculative_generate_batched(
            tparams, tcfg, dparams, dcfg, prompts, 9, gamma=3,
            temperature=0.0, max_seq_len=64)

        def logits_after(seq):
            cache = mcommon.init_kv_cache(tcfg, 1, 64)
            tok = jnp.asarray(np.asarray(seq, np.int32))[None]
            pos = jnp.arange(len(seq), dtype=jnp.int32)[None]
            lg, _ = mcommon.forward(tparams, tcfg, tok, pos, cache,
                                    jnp.full((1,), len(seq), jnp.int32))
            return np.asarray(lg[0, -1], np.float32)

        for p, got in zip(prompts, outs):
            want = target_greedy(tparams, tcfg, p, 9)
            assert len(got) == len(want)
            for i in range(len(p), len(got)):
                if got[i] == want[i]:
                    continue
                lg = logits_after(got[:i])
                # both tokens must be within bf16-tie distance of the max
                gap = float(lg.max() - min(lg[got[i]], lg[want[i]]))
                assert gap < 0.01, (i, got, want, gap)
                break   # after a tie the trajectories legitimately differ
        assert stats.proposed > 0

    def test_stochastic_self_draft_accepts(self, models):
        """Draft == target with temperature sampling: p == q at every slot
        so acceptance must be ~1 (bf16 rounding aside)."""
        tparams, tcfg, _, _ = models
        outs, stats = speculative_generate_batched(
            tparams, tcfg, tparams, tcfg, [[5, 6, 7]], 10, gamma=4,
            temperature=1.0, max_seq_len=64, seed=3)
        assert stats.acceptance_rate > 0.9, stats
        assert len(outs[0]) == 3 + 10

    def test_stochastic_runs_and_respects_eos(self, models):
        tparams, tcfg, dparams, dcfg = models
        outs, _ = speculative_generate_batched(
            tparams, tcfg, dparams, dcfg, [[1, 2], [3, 4, 5]], 8, gamma=2,
            temperature=0.8, eos_token_id=42, max_seq_len=64, seed=1)
        for p_len, o in zip((2, 3), outs):
            gen = o[p_len:]
            assert 1 <= len(gen) <= 8
            assert 42 not in gen[:-1]
