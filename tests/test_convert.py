"""Checkpoint pipeline tests: calibration, save/load roundtrip, HF-dir
quantize end-to-end with a real (tiny) transformers model on disk."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.convert import (calibrate_act_scales,
                                           load_checkpoint, save_checkpoint,
                                           quantize_hf_model)
from mixq_tensorrt_llm_tpu.models import (ModelConfig, forward, init_kv_cache,
                                          llama as mllama)
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig


def tiny_cfg(**kw):
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                max_position_embeddings=128)
    base.update(kw)
    return ModelConfig(**base)


class TestCalibration:
    def test_scales_shapes_and_keys(self):
        cfg = tiny_cfg()
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        batches = [np.random.randint(0, 256, (2, 16)) for _ in range(3)]
        scales = calibrate_act_scales(params, cfg, batches)
        assert "model.layers.0.self_attn.q_proj" in scales
        assert "model.layers.1.mlp.down_proj" in scales
        assert scales["model.layers.0.self_attn.q_proj"].shape == (64,)
        assert scales["model.layers.0.mlp.down_proj"].shape == (128,)
        # q/k/v share the same captured input
        np.testing.assert_array_equal(
            scales["model.layers.0.self_attn.q_proj"],
            scales["model.layers.0.self_attn.v_proj"])
        assert (scales["model.layers.0.self_attn.q_proj"] > 0).all()

    def test_running_max_monotone(self):
        cfg = tiny_cfg()
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(0))
        b1 = [np.random.randint(0, 256, (1, 8))]
        b2 = b1 + [np.random.randint(0, 256, (4, 16))]
        s1 = calibrate_act_scales(params, cfg, b1)
        s2 = calibrate_act_scales(params, cfg, b2)
        for k in s1:
            assert (s2[k] >= s1[k] - 1e-6).all()


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = tiny_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(1))
        save_checkpoint(str(tmp_path / "ckpt"), params, cfg)
        back, cfg2 = load_checkpoint(str(tmp_path / "ckpt"))
        assert cfg2 == cfg
        flat_a = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(back)
        assert len(flat_a) == len(flat_b)
        # logits identical through the loaded checkpoint
        toks = jnp.arange(6, dtype=jnp.int32)[None]
        cache = init_kv_cache(cfg, 1, 8)
        pos = jnp.arange(6)[None]
        lens = jnp.array([6], jnp.int32)
        la, _ = forward(params, cfg, toks, pos, cache, lens)
        cache = init_kv_cache(cfg, 1, 8)
        lb, _ = forward(back, cfg2, toks, pos, cache, lens)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_validation_catches_missing(self, tmp_path):
        cfg = tiny_cfg(quant=QuantConfig(algo=QuantAlgo.INT8_MIX,
                                         num_outliers=4))
        params = mllama.init_random_params(cfg, jax.random.PRNGKey(1))
        del params["layers"]["qkv_proj"]["fp_ind"]
        save_checkpoint(str(tmp_path / "bad"), params, cfg)
        with pytest.raises(ValueError, match="fp_ind"):
            load_checkpoint(str(tmp_path / "bad"))


class TestHFQuantizePipeline:
    @pytest.fixture(scope="class")
    def hf_dir(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig, LlamaForCausalLM
        d = tmp_path_factory.mktemp("hf_model")
        hf_cfg = LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=False)
        torch.manual_seed(0)
        model = LlamaForCausalLM(hf_cfg).eval()
        model.save_pretrained(str(d), safe_serialization=True)
        return str(d)

    def test_quantize_with_calibration(self, hf_dir, tmp_path):
        out_dir = str(tmp_path / "q")
        batches = [np.random.randint(0, 256, (2, 16)) for _ in range(2)]
        cfg = quantize_hf_model(
            hf_dir, out_dir,
            QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8),
            calib_batches=batches)
        assert os.path.exists(os.path.join(out_dir, "model.safetensors"))
        assert os.path.exists(os.path.join(out_dir, "act_scales.npz"))
        params, cfg2 = load_checkpoint(out_dir)
        assert cfg2.quant.algo == QuantAlgo.INT8_MIX
        assert params["layers"]["qkv_proj"]["qweight"].dtype == jnp.int8

        # generation through the quantized checkpoint works
        from mixq_tensorrt_llm_tpu.runtime import GenerationSession
        sess = GenerationSession(params, cfg2, max_seq_len=32,
                                 prefill_buckets=(16,))
        out = sess.generate([[1, 2, 3]], max_new_tokens=4)
        assert len(out.sequences[0]) == 7

    def test_reference_act_scales_artifact_loads(self):
        """The reference repo's shipped act_scales .pt must be loadable."""
        path = "/root/reference/act_scales/Llama-2-1b.pt"
        if not os.path.exists(path):
            pytest.skip("reference artifact not present")
        from mixq_tensorrt_llm_tpu.convert import load_act_scales
        scales = load_act_scales(path)
        assert any(k.startswith("model.layers.0.") for k in scales)
        k0 = next(iter(scales))
        assert scales[k0].ndim == 1
