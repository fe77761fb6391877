"""End-to-end CLI tests on a tiny on-disk model (quantize/generate/
eval-ppl/summarize)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)
    from tokenizers import Tokenizer, models, pre_tokenizers

    d = tmp_path_factory.mktemp("cli_model")
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      max_position_embeddings=256, rms_norm_eps=1e-5)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).save_pretrained(str(d))
    vocab = {f"w{i}": i for i in range(254)}
    vocab["<unk>"] = 254
    vocab["</s>"] = 255
    tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(tokenizer_object=tk, unk_token="<unk>",
                            eos_token="</s>").save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def ckpt_dir(model_dir, tmp_path_factory):
    from mixq_tensorrt_llm_tpu import cli
    d = tmp_path_factory.mktemp("cli_ckpt") / "ckpt"
    corpus = tmp_path_factory.mktemp("cli_data") / "corpus.txt"
    corpus.write_text(" ".join(f"w{i % 200}" for i in range(4000)))
    cli.main(["quantize", "--model_dir", model_dir, "--output_dir", str(d),
              "--qformat", "int8_mix", "--num_outliers", "8",
              "--calib_file", str(corpus), "--calib_samples", "2",
              "--calib_seq_len", "64"])
    return str(d)


def test_generate_cli(ckpt_dir, capsys):
    from mixq_tensorrt_llm_tpu import cli
    cli.main(["generate", "--model", ckpt_dir, "--prompt", "w1 w2 w3",
              "--max_new_tokens", "4", "--max_seq_len", "64"])
    out = capsys.readouterr().out
    assert "prompt" in out and "w" in out


def test_eval_ppl_cli(ckpt_dir, tmp_path, capsys):
    from mixq_tensorrt_llm_tpu import cli
    f = tmp_path / "text.txt"
    f.write_text(" ".join(f"w{i % 150}" for i in range(3000)))
    cli.main(["eval-ppl", "--model", ckpt_dir, "--text_file", str(f),
              "--seq_len", "64", "--batch_size", "2", "--max_blocks", "8"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["blocks"] == 8 and res["ppl"] > 1


def test_summarize_cli(ckpt_dir, tmp_path, capsys):
    from mixq_tensorrt_llm_tpu import cli
    data = tmp_path / "cnn.jsonl"
    with open(data, "w") as f:
        for i in range(3):
            f.write(json.dumps({
                "article": " ".join(f"w{(i + j) % 100}" for j in range(40)),
                "highlights": " ".join(f"w{(i + j) % 50}" for j in range(8)),
            }) + "\n")
    cli.main(["summarize", "--model", ckpt_dir, "--data_file", str(data),
              "--max_samples", "3", "--max_input_len", "48",
              "--output_len", "8", "--batch_size", "2"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res) == {"rouge1", "rouge2", "rougeL"}
    assert all(0 <= v <= 100 for v in res.values())
