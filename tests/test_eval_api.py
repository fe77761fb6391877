"""Tests for the PPL harness, ROUGE, and the high-level LLM API / CLI."""

import os

import jax
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.eval import evaluate_ppl, rouge_scores
from mixq_tensorrt_llm_tpu.models import ModelConfig, llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig


def tiny_cfg(**kw):
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                max_position_embeddings=256)
    base.update(kw)
    return ModelConfig(**base)


class TestPPL:
    def test_random_model_ppl_near_vocab(self):
        """An untrained model's PPL should be near vocab_size (uniform)."""
        cfg = tiny_cfg()
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        stream = np.random.randint(0, 256, (4096,))
        res = evaluate_ppl(params, cfg, stream, seq_len=64, batch_size=4)
        assert 100 < res.ppl < 600, res.ppl
        assert res.blocks == 64
        assert res.total_tokens == 64 * 63

    def test_partial_batch_exact(self):
        """NLL with a ragged final batch must equal the unbatched sum."""
        cfg = tiny_cfg()
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        stream = np.random.randint(0, 256, (5 * 32,))
        a = evaluate_ppl(params, cfg, stream, seq_len=32, batch_size=4)
        b = evaluate_ppl(params, cfg, stream, seq_len=32, batch_size=1)
        assert abs(a.total_nll - b.total_nll) / b.total_nll < 1e-4

    def test_quantized_ppl_close_to_float(self):
        """int8_mix PPL on a tiny model stays near the float PPL — the
        e2e accuracy gate in miniature (reference evalppl.py)."""
        cfgf = tiny_cfg()
        paramsf = mllama.init_random_params(cfgf, jax.random.PRNGKey(3))
        stream = np.random.randint(0, 256, (2048,))
        res_f = evaluate_ppl(paramsf, cfgf, stream, seq_len=64, batch_size=4)

        # quantize the same float weights
        from mixq_tensorrt_llm_tpu.convert import calibrate_act_scales
        scales = calibrate_act_scales(
            paramsf, cfgf, [stream[:512][None]])
        cfgq = tiny_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                          num_outliers=8))
        # rebuild float layer weights -> quantized params via the HF path is
        # heavier; directly requantize from the float pytree instead
        from mixq_tensorrt_llm_tpu.models.llama import (_quantize_layer,
                                                        stack_layers)
        layers = []
        fl = paramsf["layers"]
        for i in range(cfgf.num_layers):
            flat = {
                "qkv_proj": np.asarray(fl["qkv_proj"]["w"][i], np.float32),
                "o_proj": np.asarray(fl["o_proj"]["w"][i], np.float32),
                "gate_up_proj": np.asarray(fl["gate_up_proj"]["w"][i],
                                           np.float32),
                "down_proj": np.asarray(fl["down_proj"]["w"][i], np.float32),
                "input_norm": np.asarray(fl["input_norm"]["w"][i]),
                "post_norm": np.asarray(fl["post_norm"]["w"][i]),
            }
            layers.append(_quantize_layer(cfgq, flat, scales, i))
        paramsq = dict(paramsf)
        paramsq["layers"] = stack_layers(layers)
        res_q = evaluate_ppl(paramsq, cfgq, stream, seq_len=64, batch_size=4)
        assert abs(res_q.ppl - res_f.ppl) / res_f.ppl < 0.05, \
            (res_q.ppl, res_f.ppl)


class TestRouge:
    def test_identical_is_100(self):
        s = ["the quick brown fox jumps over the lazy dog"]
        out = rouge_scores(s, s)
        assert out["rouge1"] == 100.0
        assert out["rouge2"] == 100.0
        assert out["rougeL"] == 100.0

    def test_disjoint_is_0(self):
        out = rouge_scores(["aaa bbb ccc"], ["xxx yyy zzz"])
        assert out["rouge1"] == 0.0 and out["rougeL"] == 0.0

    def test_partial_overlap(self):
        out = rouge_scores(["the cat sat on the mat"],
                           ["the cat lay on the rug"])
        assert 0 < out["rouge1"] < 100
        assert out["rougeL"] >= out["rouge2"]


class TestLLMApi:
    @pytest.fixture(scope="class")
    def hf_dir(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig, LlamaForCausalLM
        d = tmp_path_factory.mktemp("hf_api")
        hf_cfg = LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5)
        torch.manual_seed(0)
        LlamaForCausalLM(hf_cfg).save_pretrained(str(d))
        return str(d)

    def test_llm_auto_quantize_and_generate_tokens(self, hf_dir, tmp_path):
        from mixq_tensorrt_llm_tpu.api import LLM
        llm = LLM(hf_dir, quant="int8_mix", max_seq_len=64,
                  cache_dir=str(tmp_path / "cache"))
        assert llm.cfg.quant.algo == QuantAlgo.INT8_MIX
        out = llm.generate_tokens([[1, 2, 3]], max_new_tokens=4)
        assert len(out.sequences[0]) == 7
        # second construction hits the cache (no re-quantize)
        llm2 = LLM(hf_dir, quant="int8_mix", max_seq_len=64,
                   cache_dir=str(tmp_path / "cache"))
        out2 = llm2.generate_tokens([[1, 2, 3]], max_new_tokens=4)
        assert out.sequences == out2.sequences


class TestEncDecSummarize:
    def test_summarize_enc_dec_cli(self, tmp_path, capsys):
        """`summarize --enc_dec` drives a T5 dir end-to-end (reference
        summarize.py enc_dec path)."""
        torch = pytest.importorskip("torch")
        import json as _json
        from transformers import (PreTrainedTokenizerFast, T5Config,
                                  T5ForConditionalGeneration)
        from tokenizers import Tokenizer, models, pre_tokenizers

        d = tmp_path / "t5"
        hf_cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4,
                          d_ff=64, num_layers=2, num_decoder_layers=2,
                          decoder_start_token_id=0, eos_token_id=1)
        torch.manual_seed(0)
        T5ForConditionalGeneration(hf_cfg).save_pretrained(str(d))
        vocab = {w: i for i, w in enumerate(
            ["</s>", "<unk>", "summarize", ":", "the", "cat", "sat"])}
        vocab["</s>"] = 1
        vocab["<unk>"] = 2
        for i in range(len(vocab), 64):
            vocab[f"w{i}"] = i
        tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tk.pre_tokenizer = pre_tokenizers.Whitespace()
        PreTrainedTokenizerFast(tokenizer_object=tk, unk_token="<unk>",
                                eos_token="</s>").save_pretrained(str(d))

        data = tmp_path / "data.jsonl"
        with open(data, "w") as f:
            f.write(_json.dumps({"article": "the cat sat",
                                 "highlights": "the cat"}) + "\n")

        import argparse
        from mixq_tensorrt_llm_tpu.cli import _cmd_summarize
        args = argparse.Namespace(
            model=str(d), quant=None, data_file=str(data), max_samples=2,
            max_input_len=32, output_len=4, batch_size=1,
            rouge1_threshold=None, enc_dec=True)
        _cmd_summarize(args)
        scores = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert set(scores) == {"rouge1", "rouge2", "rougeL"}

def test_llm_auto_quantize_w4a16_g(tmp_path):
    """LLM accepts a full QuantConfig (custom group_size) and the
    w4a16_g checkpoint round-trips through the cache dir."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path / "hf"
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5)
    torch.manual_seed(0)
    LlamaForCausalLM(hf_cfg).save_pretrained(str(d))

    from mixq_tensorrt_llm_tpu.api import LLM
    from mixq_tensorrt_llm_tpu.quant import QuantConfig
    qc = QuantConfig(algo=QuantAlgo.W4A16_G, group_size=32)
    llm = LLM(str(d), quant=qc, max_seq_len=64,
              cache_dir=str(tmp_path / "cache"))
    assert llm.cfg.quant.algo == QuantAlgo.W4A16_G
    assert llm.cfg.quant.group_size == 32
    out = llm.generate_tokens([[1, 2, 3]], max_new_tokens=4)
    assert len(out.sequences[0]) == 7
