"""LoRA merge tests: PEFT artifact parsing + merged-quantize pipeline."""

import json
import os

import numpy as np
import pytest


def make_adapter(d, base_sd, r=4, alpha=8):
    """Write a synthetic PEFT adapter targeting q_proj of layer 0."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "adapter_config.json"), "w") as f:
        json.dump({"r": r, "lora_alpha": alpha,
                   "target_modules": ["q_proj"]}, f)
    rng = np.random.default_rng(0)
    out_f, in_f = base_sd["model.layers.0.self_attn.q_proj.weight"].shape
    A = rng.normal(size=(r, in_f)).astype(np.float32) * 0.1
    B = rng.normal(size=(out_f, r)).astype(np.float32) * 0.1
    import safetensors.numpy
    safetensors.numpy.save_file(
        {"base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A,
         "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B},
        os.path.join(d, "adapter_model.safetensors"))
    return A, B, alpha / r


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM
    d = tmp_path_factory.mktemp("lora_base")
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      max_position_embeddings=64)
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).save_pretrained(str(d))
    return str(d)


def test_merge_math(hf_dir, tmp_path):
    from mixq_tensorrt_llm_tpu.convert.hf import load_hf_state_dict
    from mixq_tensorrt_llm_tpu.convert.lora import merge_lora_into_state_dict

    sd = load_hf_state_dict(hf_dir)
    A, B, scale = make_adapter(str(tmp_path / "ad"), sd)
    merged = merge_lora_into_state_dict(sd, str(tmp_path / "ad"))
    key = "model.layers.0.self_attn.q_proj.weight"
    want = np.asarray(sd[key], np.float32) + (B @ A) * scale
    np.testing.assert_allclose(merged[key], want, rtol=1e-6)
    # untouched weights unchanged
    other = "model.layers.1.self_attn.q_proj.weight"
    np.testing.assert_array_equal(np.asarray(merged[other]),
                                  np.asarray(sd[other]))


def test_quantize_with_lora_changes_logits(hf_dir, tmp_path):
    from mixq_tensorrt_llm_tpu.convert.hf import (load_hf_state_dict,
                                                  quantize_hf_model)
    from mixq_tensorrt_llm_tpu.convert import load_checkpoint
    from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig

    sd = load_hf_state_dict(hf_dir)
    make_adapter(str(tmp_path / "ad2"), sd)
    q = QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8)
    quantize_hf_model(hf_dir, str(tmp_path / "plain"), q)
    quantize_hf_model(hf_dir, str(tmp_path / "lora"), q,
                      lora_dir=str(tmp_path / "ad2"))
    a, cfg = load_checkpoint(str(tmp_path / "plain"))
    b, _ = load_checkpoint(str(tmp_path / "lora"))
    qa = np.asarray(a["layers"]["qkv_proj"]["qweight"][0])
    qb = np.asarray(b["layers"]["qkv_proj"]["qweight"][0])
    assert not np.array_equal(qa, qb)         # layer-0 qkv changed
    np.testing.assert_array_equal(
        np.asarray(a["layers"]["down_proj"]["qweight"]),
        np.asarray(b["layers"]["down_proj"]["qweight"]))   # others intact


def test_missing_adapter_errors(hf_dir, tmp_path):
    from mixq_tensorrt_llm_tpu.convert.lora import merge_lora_into_state_dict
    from mixq_tensorrt_llm_tpu.convert.hf import load_hf_state_dict
    with pytest.raises(FileNotFoundError):
        d = tmp_path / "empty"
        os.makedirs(d)
        with open(d / "adapter_config.json", "w") as f:
            json.dump({"r": 4, "lora_alpha": 8}, f)
        merge_lora_into_state_dict(load_hf_state_dict(hf_dir), str(d))
