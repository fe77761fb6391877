"""Runtime multi-LoRA serving: stacked unmerged adapters selected per lane.

Equivalence oracle: forward with lora_ids=[n] must match the merge-at-
quantize path (convert.lora.merge_lora_into_state_dict) for the same
adapter — the two implementations share only the PEFT artifact. Executor
test: concurrent requests with different lora_ids are isolated.
Reference: tensorrt_llm lora_manager + per-request LoraConfig.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
safetensors_numpy = pytest.importorskip("safetensors.numpy")

from mixq_tensorrt_llm_tpu.convert.lora import (attach_lora,
                                                build_lora_stack,
                                                merge_lora_into_state_dict)
from mixq_tensorrt_llm_tpu.models import init_kv_cache, forward
from mixq_tensorrt_llm_tpu.models import llama as mllama
from mixq_tensorrt_llm_tpu.quant import QuantConfig


_ATTN = ("q_proj", "k_proj", "v_proj", "o_proj")


def write_adapter(d, sd, targets, r, alpha, seed):
    """targets: list of (layer, hf_target) pairs."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "adapter_config.json"), "w") as f:
        json.dump({"r": r, "lora_alpha": alpha,
                   "target_modules": sorted({t for _, t in targets})}, f)
    rng = np.random.default_rng(seed)
    tensors = {}
    for layer, tgt in targets:
        grp = "self_attn" if tgt in _ATTN else "mlp"
        wkey = f"model.layers.{layer}.{grp}.{tgt}.weight"
        out_f, in_f = sd[wkey].shape
        base = f"base_model.model.model.layers.{layer}.{grp}.{tgt}"
        tensors[base + ".lora_A.weight"] = (
            rng.normal(size=(r, in_f)).astype(np.float32) * 0.05)
        tensors[base + ".lora_B.weight"] = (
            rng.normal(size=(out_f, r)).astype(np.float32) * 0.05)
    safetensors_numpy.save_file(tensors,
                                os.path.join(d, "adapter_model.safetensors"))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=16, max_position_embeddings=64,
                         attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    root = tmp_path_factory.mktemp("adapters")
    d1, d2 = str(root / "a1"), str(root / "a2")
    write_adapter(d1, sd, [(0, "q_proj"), (1, "q_proj")], r=4, alpha=8,
                  seed=1)
    write_adapter(d2, sd,
                  [(0, "q_proj"), (0, "v_proj"), (0, "up_proj"),
                   (1, "down_proj"), (1, "o_proj")], r=2, alpha=4, seed=2)

    cfg = mllama.config_from_hf(hf_cfg, QuantConfig())
    params = mllama.params_from_hf(cfg, sd)
    stack = build_lora_stack(cfg, [d1, d2])
    params = attach_lora(params, stack)
    return cfg, params, sd, (d1, d2)


def run_forward(cfg, params, tokens, lora_ids=None):
    b, s = tokens.shape
    cache = init_kv_cache(cfg, b, 16)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    logits, _ = forward(params, cfg, jnp.asarray(tokens), pos, cache,
                        jnp.full((b,), s, jnp.int32),
                        lora_ids=None if lora_ids is None
                        else jnp.asarray(lora_ids, jnp.int32))
    return np.asarray(logits)


TOKENS = np.array([[1, 5, 9, 42, 7, 100, 3, 120]], np.int32)


class TestStackEquivalence:
    def test_id0_is_base(self, setup):
        cfg, params, sd, _ = setup
        base = run_forward(cfg, params, TOKENS)
        got = run_forward(cfg, params, TOKENS, lora_ids=[0])
        np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("aid", [1, 2])
    def test_matches_merged(self, setup, aid):
        cfg, params, sd, dirs = setup
        merged_sd = merge_lora_into_state_dict(sd, dirs[aid - 1])
        merged_params = mllama.params_from_hf(cfg, merged_sd)
        want = run_forward(cfg, merged_params, TOKENS)
        got = run_forward(cfg, params, TOKENS, lora_ids=[aid])
        base = run_forward(cfg, params, TOKENS)
        assert np.abs(want - base).max() > 1e-3   # adapter actually acts
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    def test_mixed_batch_lanes_are_independent(self, setup):
        cfg, params, _, _ = setup
        toks3 = np.tile(TOKENS, (3, 1))
        got = run_forward(cfg, params, toks3, lora_ids=[0, 1, 2])
        for lane, aid in enumerate((0, 1, 2)):
            solo = run_forward(cfg, params, TOKENS, lora_ids=[aid])
            np.testing.assert_allclose(got[lane:lane + 1], solo,
                                       rtol=2e-2, atol=2e-2)


class TestExecutorLora:
    def test_per_request_adapters(self, setup):
        from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
        cfg, params, _, _ = setup
        prompt = [1, 5, 9, 42]

        def run(lora_ids):
            ex = Executor(params, cfg, max_batch=4, max_seq_len=32,
                          block_size=8, prefill_chunk=8, seed=0)
            rids = [ex.submit(prompt, max_new_tokens=6, lora_id=a)
                    for a in lora_ids]
            done = ex.run()
            return [done[r].generated for r in rids]

        together = run([0, 1, 2])
        for i, aid in enumerate((0, 1, 2)):
            alone = run([aid])
            assert together[i] == alone[0], (aid, together[i], alone[0])

    def test_rejects_unattached(self, setup):
        from mixq_tensorrt_llm_tpu.runtime.scheduler import Executor
        cfg, params, sd, _ = setup
        bare = mllama.params_from_hf(cfg, sd)
        ex = Executor(bare, cfg, max_batch=2, max_seq_len=32, block_size=8)
        with pytest.raises(ValueError, match="no adapters"):
            ex.submit([1, 2, 3], max_new_tokens=4, lora_id=1)
