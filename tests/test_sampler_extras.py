"""Tests: repetition penalty, min_new_tokens eos ban, stop sequences, MMLU."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig
from mixq_tensorrt_llm_tpu.runtime import GenerationSession, SamplingConfig
from mixq_tensorrt_llm_tpu.runtime.sampler import (BW_PAD,
                                                   apply_repetition_penalty,
                                                   ban_bad_words,
                                                   pack_bad_words, sample)


@pytest.fixture(scope="module")
def session():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=128,
                      quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                        num_outliers=4))
    params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
    return GenerationSession(params, cfg, max_seq_len=64,
                             prefill_buckets=(8, 16))


class TestRepetitionPenalty:
    def test_seen_tokens_penalized(self):
        logits = jnp.array([[2.0, -1.0, 3.0, 0.5]])
        hist = jnp.array([[0, 1, -1]])
        out = np.asarray(apply_repetition_penalty(logits, hist, 2.0))
        assert out[0, 0] == 1.0     # positive / 2
        assert out[0, 1] == -2.0    # negative * 2
        assert out[0, 2] == 3.0     # unseen unchanged
        assert out[0, 3] == 0.5

    def test_sample_with_penalty_changes_argmax(self):
        logits = jnp.array([[3.0, 2.9, 0.0]])
        hist = jnp.array([[0]])
        cfg = SamplingConfig(repetition_penalty=2.0)
        tok = sample(logits, jax.random.PRNGKey(0), cfg, history=hist)
        assert int(tok[0]) == 1      # 3.0/2=1.5 < 2.9

    def test_generation_reduces_repeats(self, session):
        plain = session.generate([[1, 2, 3]], 12).sequences[0][3:]
        pen = session.generate(
            [[1, 2, 3]], 12,
            sampling=SamplingConfig(repetition_penalty=5.0)).sequences[0][3:]
        assert len(set(pen)) >= len(set(plain))


class TestEosControls:
    def test_min_new_tokens_bans_eos(self, session):
        base = session.generate([[1, 2, 3]], 8).sequences[0]
        eos = base[3]   # force the would-be-first token as eos
        out = session.generate([[1, 2, 3]], 8, eos_token_id=eos,
                               min_new_tokens=4)
        # eos banned for steps 1..3, so at least 4 tokens generated
        assert len(out.sequences[0]) - 3 >= 4

    def test_stop_sequence_truncates(self, session):
        base = session.generate([[1, 2, 3]], 10).sequences[0]
        gen = base[3:]
        stop = gen[2:4]     # a 2-token suffix that will occur
        out = session.generate([[1, 2, 3]], 10, stop_sequences=[stop])
        got_gen = out.sequences[0][3:]
        assert got_gen == gen[:4]


class TestBadWords:
    def test_pack_right_aligns(self):
        packed = np.asarray(pack_bad_words([[7], [1, 2, 3]]))
        assert packed.shape == (2, 3)
        assert packed[0].tolist() == [BW_PAD, BW_PAD, 7]
        assert packed[1].tolist() == [1, 2, 3]

    def test_single_token_always_banned(self):
        logits = jnp.array([[0.0, 5.0, 1.0, 0.0]])
        hist = jnp.full((1, 4), -1, jnp.int32)
        out = np.asarray(ban_bad_words(logits, hist, pack_bad_words([[1]])))
        assert out[0, 1] == -np.inf and out[0, 2] == 1.0

    def test_multi_token_needs_prefix(self):
        logits = jnp.zeros((2, 4))
        # lane 0 history ends ...5, 3 ; lane 1 ends ...9
        hist = jnp.array([[-1, -1, 5, 3], [-1, -1, -1, 9]], jnp.int32)
        out = np.asarray(ban_bad_words(logits, hist,
                                       pack_bad_words([[5, 3, 2]])))
        assert out[0, 2] == -np.inf          # prefix 5,3 matched
        assert np.isfinite(out[1]).all()     # lane 1: no match

    def test_per_lane_words(self):
        logits = jnp.zeros((2, 4))
        hist = jnp.full((2, 4), -1, jnp.int32)
        bw = jnp.stack([np.asarray(pack_bad_words([[1]])),
                        np.full((1, 2), BW_PAD, np.int32)])   # lane 1: none
        out = np.asarray(ban_bad_words(logits, hist, bw))
        assert out[0, 1] == -np.inf
        assert np.isfinite(out[1]).all()

    def test_generation_never_emits_banned_token(self, session):
        base = session.generate([[1, 2, 3]], 10).sequences[0][3:]
        tok = base[1]
        out = session.generate([[1, 2, 3]], 10,
                               bad_words=[[tok]]).sequences[0][3:]
        assert tok not in out

    def test_generation_never_emits_banned_pair(self, session):
        base = session.generate([[1, 2, 3]], 10).sequences[0][3:]
        pair = base[1:3]
        assert pair[0] != pair[1]   # a self-pair would still be bannable,
        # but distinct ids make the adjacency check below unambiguous
        out = session.generate([[1, 2, 3]], 12,
                               bad_words=[pair]).sequences[0][3:]
        assert pair[0] in out       # only the CONTINUATION is banned
        for a, b in zip(out, out[1:]):
            assert [a, b] != pair


class TestLogitsProcessors:
    def test_processor_forces_token(self, session):
        def force7(logits, history):
            return jnp.full_like(logits, -1e9).at[:, 7].set(0.0)
        out = session.generate([[1, 2, 3]], 5,
                               logits_processors=(force7,)).sequences[0][3:]
        assert out == [7] * 5

    def test_processor_sees_history(self, session):
        # emit history[-1] + 1 every step: a counting processor proves the
        # right-aligned history window reaches the processor each step
        def count_up(logits, history):
            nxt = (history[:, -1] + 1) % logits.shape[-1]
            hot = jax.nn.one_hot(nxt, logits.shape[-1], dtype=logits.dtype)
            return hot * 1e9 - 1e9 * (1 - hot)
        out = session.generate([[1, 2, 3]], 5,
                               logits_processors=(count_up,)).sequences[0]
        assert out[3:] == [4, 5, 6, 7, 8]


class TestMMLU:
    def test_mmlu_eval_on_synthetic_csvs(self, tmp_path):
        pytest.importorskip("torch")
        from transformers import (LlamaConfig, LlamaForCausalLM,
                                  PreTrainedTokenizerFast)
        from tokenizers import Tokenizer, models, pre_tokenizers
        import torch

        d = tmp_path / "model"
        cfg = LlamaConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          head_dim=16, max_position_embeddings=512)
        torch.manual_seed(0)
        LlamaForCausalLM(cfg).save_pretrained(str(d))
        vocab = {w: i for i, w in enumerate(
            ["A", "B", "C", "D", "Answer", ":", ".", "?", "<unk>"])}
        for i in range(len(vocab), 256):
            vocab[f"w{i}"] = i
        tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tk.pre_tokenizer = pre_tokenizers.Whitespace()
        PreTrainedTokenizerFast(tokenizer_object=tk,
                                unk_token="<unk>").save_pretrained(str(d))

        data = tmp_path / "mmlu"
        os.makedirs(data)
        with open(data / "algebra_test.csv", "w", newline="") as f:
            wcsv = csv.writer(f)
            for i in range(4):
                wcsv.writerow([f"w{10+i} w{20+i} ?", "w30", "w31", "w32",
                               "w33", "ABCD"[i]])

        from mixq_tensorrt_llm_tpu.api import LLM
        llm = LLM(str(d), quant="int8_mix", max_seq_len=256,
                  cache_dir=str(tmp_path / "cache"))
        from mixq_tensorrt_llm_tpu.eval.mmlu import evaluate_mmlu
        acc = evaluate_mmlu(llm, str(data), k_shot=0, max_input_len=128)
        assert "algebra" in acc and "average" in acc
        assert 0.0 <= acc["average"] <= 1.0


class TestContextLogits:
    def test_context_logits_match_score(self, session):
        """return_context_logits (reference --gather_context_logits)
        returns per-prompt-position logits matching score_logits."""
        prompts = [[1, 2, 3, 4], [5, 6]]
        out = session.generate(prompts, 3, return_context_logits=True)
        assert [c.shape[0] for c in out.context_logits] == [4, 2]
        toks = np.zeros((2, 4), np.int32)
        toks[0, :4] = prompts[0]
        toks[1, :2] = prompts[1]
        ref = np.asarray(session.score_logits(toks, np.array([4, 2])))
        for i, p in enumerate(prompts):
            np.testing.assert_allclose(out.context_logits[i],
                                       ref[i, :len(p)], rtol=5e-2,
                                       atol=5e-2)
