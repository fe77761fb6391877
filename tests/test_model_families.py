"""Model-zoo families: HF logits parity + quantized forward sanity.

Covers every non-llama family in the registry (reference
MixQ/src/mixquant/models/auto.py + tensorrt_llm MODEL_MAP): OPT, GPT-2,
GPT-J, GPT-NeoX, Falcon (MQA and new-decoder GQA), BLOOM, MPT, Phi, Gemma.
Baichuan has no offline HF class (trust_remote_code); its converter is
checked by re-packing llama weights into the baichuan W_pack layout.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tensorrt_llm_tpu.models import init_kv_cache, forward
from mixq_tensorrt_llm_tpu.models import registry
from mixq_tensorrt_llm_tpu.quant import QuantAlgo, QuantConfig

torch = pytest.importorskip("torch")

TOKENS = np.array([[1, 5, 9, 42, 7, 100, 3, 200]], np.int32)


def _opt():
    from transformers import OPTConfig, OPTForCausalLM
    return OPTForCausalLM, OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=64,
        attn_implementation="eager")


def _gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel
    return GPT2LMHeadModel, GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=64,
        attn_implementation="eager")


def _gptj():
    from transformers import GPTJConfig, GPTJForCausalLM
    return GPTJForCausalLM, GPTJConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
        n_positions=64, attn_implementation="eager")


def _gpt_neox():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    return GPTNeoXForCausalLM, GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
        max_position_embeddings=64, use_parallel_residual=True,
        attn_implementation="eager")


def _falcon_mqa():
    from transformers import FalconConfig, FalconForCausalLM
    return FalconForCausalLM, FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True,
        new_decoder_architecture=False, parallel_attn=True, bias=False,
        alibi=False, attn_implementation="eager")


def _falcon_gqa():
    from transformers import FalconConfig, FalconForCausalLM
    return FalconForCausalLM, FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2,
        new_decoder_architecture=True, bias=False, alibi=False,
        attn_implementation="eager")


def _bloom():
    from transformers import BloomConfig, BloomForCausalLM
    return BloomForCausalLM, BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        attn_implementation="eager")


def _mpt():
    from transformers import MptConfig, MptForCausalLM
    return MptForCausalLM, MptConfig(
        d_model=64, n_heads=4, n_layers=2, expansion_ratio=4,
        max_seq_len=64, vocab_size=256, no_bias=True,
        attn_implementation="eager")


def _phi():
    from transformers import PhiConfig, PhiForCausalLM
    return PhiForCausalLM, PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=64,
        attn_implementation="eager")


def _gpt_bigcode():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM
    return GPTBigCodeForCausalLM, GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=64,
        multi_query=True, attn_implementation="eager")


def _starcoder2():
    from transformers import Starcoder2Config, Starcoder2ForCausalLM
    return Starcoder2ForCausalLM, Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, use_bias=True,
        attn_implementation="eager")


def _stablelm():
    from transformers import StableLmConfig, StableLmForCausalLM
    return StableLmForCausalLM, StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, partial_rotary_factor=0.25,
        attn_implementation="eager")


def _gemma():
    from transformers import GemmaConfig, GemmaForCausalLM
    return GemmaForCausalLM, GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
        attn_implementation="eager")


def _gemma2():
    from transformers import Gemma2Config, Gemma2ForCausalLM
    return Gemma2ForCausalLM, Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
        query_pre_attn_scalar=24, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=4,
        attn_implementation="eager")


def _qwen3():
    from transformers import Qwen3Config, Qwen3ForCausalLM
    return Qwen3ForCausalLM, Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
        tie_word_embeddings=False, attn_implementation="eager")


def _glm():
    from transformers import GlmConfig, GlmForCausalLM
    return GlmForCausalLM, GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, attn_implementation="eager")


def _glm4():
    from transformers import Glm4Config, Glm4ForCausalLM
    return Glm4ForCausalLM, Glm4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=1, attn_implementation="eager")


def _olmo2():
    from transformers import Olmo2Config, Olmo2ForCausalLM
    return Olmo2ForCausalLM, Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager")


def _cohere():
    from transformers import CohereConfig, CohereForCausalLM
    return CohereForCausalLM, CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        logit_scale=0.125, max_position_embeddings=64,
        attn_implementation="eager")


def _granite():
    from transformers import GraniteConfig, GraniteForCausalLM
    return GraniteForCausalLM, GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=4.0, residual_multiplier=0.5,
        attention_multiplier=0.3, logits_scaling=2.0,
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager")


def _qwen2_moe():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    return Qwen2MoeForCausalLM, Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        moe_intermediate_size=48, shared_expert_intermediate_size=96,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager")


def _qwen3_moe():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    return Qwen3MoeForCausalLM, Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True, moe_intermediate_size=48,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager")


def _phi3():
    from transformers import Phi3Config, Phi3ForCausalLM
    return Phi3ForCausalLM, Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=4,
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1,
        bos_token_id=2, attn_implementation="eager")


def _dbrx():
    from transformers import DbrxConfig, DbrxForCausalLM
    return DbrxForCausalLM, DbrxConfig(
        vocab_size=256, d_model=64, n_heads=4, n_layers=2, max_seq_len=64,
        attn_config={"kv_n_heads": 2, "clip_qkv": 0.4,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0,
                    "moe_jitter_eps": None,
                    "ffn_act_fn": {"name": "silu"}},
        attn_implementation="eager")


FAMILIES = {
    "opt": _opt, "gpt2": _gpt2, "gptj": _gptj, "gpt_neox": _gpt_neox,
    "falcon_mqa": _falcon_mqa, "falcon_gqa": _falcon_gqa, "bloom": _bloom,
    "mpt": _mpt, "phi": _phi, "gemma": _gemma, "gemma2": _gemma2,
    "qwen3": _qwen3, "glm": _glm, "glm4": _glm4, "olmo2": _olmo2,
    "cohere": _cohere, "granite": _granite,
    "qwen2_moe": _qwen2_moe, "qwen3_moe": _qwen3_moe,
    "phi3": _phi3, "dbrx": _dbrx,
    "gpt_bigcode": _gpt_bigcode, "starcoder2": _starcoder2,
    "stablelm": _stablelm,
}


def build_hf(name):
    cls, hf_cfg = FAMILIES[name]()
    torch.manual_seed(0)
    model = cls(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd, hf_cfg


def our_logits(cfg, params, tokens=TOKENS):
    b, s = tokens.shape
    cache = init_kv_cache(cfg, b, 16)
    pos = jnp.tile(jnp.arange(s), (b, 1))
    logits, _ = forward(params, cfg, jnp.asarray(tokens), pos, cache,
                        jnp.full((b,), s, jnp.int32))
    return np.asarray(logits)


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_hf_logits_parity(name):
    model, sd, hf_cfg = build_hf(name)
    cfg = registry.config_from_hf(hf_cfg)
    params = registry.params_from_hf(cfg, sd)
    with torch.no_grad():
        hf_logits = model(torch.tensor(TOKENS, dtype=torch.long)
                          ).logits.numpy()
    got = our_logits(cfg, params)
    np.testing.assert_allclose(got, hf_logits, rtol=0.1, atol=0.15)
    # greedy parity where HF's top-1 margin clears bf16 weight noise —
    # random tiny models have near-flat logits, so an unconditional argmax
    # compare is seed noise, not a correctness signal
    srt = np.sort(hf_logits, axis=-1)
    decisive = (srt[..., -1] - srt[..., -2]) > 0.02
    match = got.argmax(-1) == hf_logits.argmax(-1)
    assert match[decisive].mean() > 0.98, match[decisive].mean()


@pytest.mark.parametrize("name", ["opt", "gptj", "bloom", "phi", "gemma",
                                  "gemma2", "qwen3"])
def test_int8_mix_forward_close(name):
    """Quantized forward stays close to the float path for every block
    structure (sequential/parallel, LN/RMS, dense/gated, alibi/rope)."""
    _, sd, hf_cfg = build_hf(name)
    quant = QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=8)
    cfg_f = registry.config_from_hf(hf_cfg)
    cfg_q = registry.config_from_hf(hf_cfg, quant)
    ref = our_logits(cfg_f, registry.params_from_hf(cfg_f, sd))
    got = our_logits(cfg_q, registry.params_from_hf(cfg_q, sd))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.75


def test_random_init_matches_schema():
    """init_random_params produces the same pytree structure as HF
    conversion for a structurally-rich arch (parallel + LN + biases)."""
    _, sd, hf_cfg = build_hf("phi")
    cfg = registry.config_from_hf(
        hf_cfg, QuantConfig(algo=QuantAlgo.INT8_MIX, num_outliers=4))
    a = registry.params_from_hf(cfg, sd)
    b = registry.init_random_params(cfg, jax.random.PRNGKey(0))
    sa = jax.tree_util.tree_structure(a)
    sb = jax.tree_util.tree_structure(b)
    assert sa == sb, (sa, sb)


def test_baichuan_wpack_layout():
    """Baichuan-7B == llama with fused W_pack: repack tiny-llama HF weights
    into baichuan naming and require identical logits via both converters."""
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    bsd = {}
    for k, v in sd.items():
        if ".self_attn.q_proj." in k:
            base = k.split(".self_attn.")[0]
            bsd[base + ".self_attn.W_pack.weight"] = np.concatenate(
                [sd[base + f".self_attn.{n}_proj.weight"] for n in "qkv"],
                axis=0)
        elif ".self_attn.k_proj." in k or ".self_attn.v_proj." in k:
            continue
        else:
            bsd[k] = v

    class FakeCfg:
        model_type = "baichuan"
        vocab_size = 256
        hidden_size = 64
        intermediate_size = 128
        num_hidden_layers = 2
        num_attention_heads = 4
        max_position_embeddings = 64
        rms_norm_eps = 1e-6
        tie_word_embeddings = False

    from mixq_tensorrt_llm_tpu.models import llama as mllama
    cfg_l = mllama.config_from_hf(hf_cfg)
    cfg_b = registry.config_from_hf(FakeCfg())
    assert cfg_b.pos_embedding == "rope"   # 7B geometry
    ref = our_logits(cfg_l, registry.params_from_hf(cfg_l, sd))
    got = our_logits(cfg_b, registry.params_from_hf(cfg_b, bsd))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gemma2_paged_executor_matches_session():
    """Gemma-2 axes through the runtime: alternating per-layer windows
    (grouped layer scan), logit softcaps, and post-block norms must give
    identical greedy tokens on the dense session and the paged executor."""
    from mixq_tensorrt_llm_tpu.models import ModelConfig
    from mixq_tensorrt_llm_tpu.models.families import init_random_params
    from mixq_tensorrt_llm_tpu.runtime import Executor, GenerationSession
    cfg = ModelConfig(
        arch="gemma2", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_layers=4, num_heads=4, num_kv_heads=2,
        head_dim=16, attn_scale=24 ** -0.5, attn_logit_softcap=50.0,
        final_logit_softcap=30.0, post_block_norms=True,
        sliding_window=8, sliding_window_pattern=2,
        hidden_act="gelu_pytorch_tanh", embed_scale=8.0,
        tie_word_embeddings=True, max_position_embeddings=128)
    params = init_random_params(cfg, jax.random.PRNGKey(1))
    session = GenerationSession(params, cfg, max_seq_len=64,
                                prefill_buckets=(16,),
                                use_flash_prefill=False)
    # prompt longer than the window so windowed layers actually truncate
    prompts = [list(range(1, 13)), [20, 21, 22]]
    want = session.generate(prompts, max_new_tokens=8).sequences

    ex = Executor(params, cfg, max_batch=2, max_seq_len=64,
                  block_size=8, prefill_chunk=16)
    ids = [ex.submit(p, max_new_tokens=8) for p in prompts]
    done = ex.run()
    assert [done[i].sequence for i in ids] == want


def test_alibi_session_generate():
    """ALiBi model through GenerationSession greedy decode: prefill and
    stepwise decode must agree (positions enter only via the bias)."""
    from mixq_tensorrt_llm_tpu.runtime import GenerationSession
    _, sd, hf_cfg = build_hf("bloom")
    cfg = registry.config_from_hf(hf_cfg)
    params = registry.params_from_hf(cfg, sd)
    sess = GenerationSession(params, cfg, max_seq_len=32,
                             prefill_buckets=(8,), use_flash_prefill=False)
    out = sess.generate([[3, 1, 4, 1, 5]], max_new_tokens=6)
    assert len(out.sequences[0]) == 11

    # teacher-forced check: each decoded token is the argmax continuation
    seq = out.sequences[0]
    for i in range(5, len(seq)):
        lg = our_logits(cfg, params, np.asarray([seq[:i]], np.int32))
        assert int(lg[0, -1].argmax()) == seq[i], (i, seq)


def test_phi3_longrope_parity():
    """Phi-3 128k longrope: per-dim frequency divisors + attention factor
    (long_factor chosen at config time for an extended-context serve)."""
    from transformers import Phi3Config, Phi3ForCausalLM
    half = 8   # head_dim 16 -> 8 freq dims
    hf_cfg = Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        original_max_position_embeddings=32,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0] * half,
                      "long_factor": [1.0 + 0.3 * i for i in range(half)]},
        pad_token_id=0, eos_token_id=1, bos_token_id=2,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = Phi3ForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = registry.config_from_hf(hf_cfg)
    assert cfg.rope_scaling_type == "longrope"
    assert len(cfg.rope_freq_factors) == half
    params = registry.params_from_hf(cfg, sd)

    toks = np.array([[1, 5, 9, 42, 7, 100, 3, 200] * 6], np.int32)  # 48 > 32
    with torch.no_grad():
        want = model(torch.tensor(toks.tolist(), dtype=torch.long)
                     ).logits.numpy()
    got = our_logits(cfg, params, toks)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.15)
