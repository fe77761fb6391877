"""Model zoo beyond the llama lineage: OPT, GPT-2, GPT-J, GPT-NeoX,
Falcon, BLOOM, MPT, Phi, Gemma, Gemma-2, Qwen3, GLM/GLM-4, OLMo-2,
Cohere (Command-R), Granite, Baichuan, GPT-BigCode, StarCoder2, StableLM.

Reference parity: the MixQ PyTorch registry covers llama / baichuan /
aquila / gptj / falcon / opt (+ mistral / mpt / bloom / gpt_neox partial)
(MixQ/src/mixquant/models/auto.py:6-15), and the TRT-LLM zoo adds gpt /
gptj / falcon / bloom / opt / gemma / phi model classes
(tensorrt_llm/models/__init__.py MODEL_MAP). TPU re-design: there is ONE
decoder (models/common.decoder_layer) driven by ModelConfig axes; each
family here is a config translation plus an HF-state-dict weight mapping
into the uniform fused-QKV params schema. Quantization routing is shared
with llama.py (qkv/gate_up/o mix, down weight-only — SURVEY §2.4).

Weight-layout notes (each arch fuses QKV differently in HF):
- gpt_neox / bloom / old-falcon-MHA: query_key_value rows interleaved per
  head as (H, [q|k|v], D)
- falcon new_decoder_architecture: grouped (n_kv, [q*g|k|v], D)
- falcon multi_query (7B): contiguous [q(H*D), k(D), v(D)]
- mpt Wqkv / baichuan W_pack: contiguous [q, k, v]
- gpt2 c_attn: Conv1D (in, 3*out) — already kernel layout, no transpose
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.config import QuantAlgo, QuantConfig
from ..ops import dispatch
from .common import ModelConfig
from .llama import LINEAR_MODULES, stack_layers


def _arr(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x))


def _t(w) -> jnp.ndarray:
    """HF torch (out, in) -> our (in, out) kernel layout."""
    return _arr(w).T


def _norm(hf: Mapping, base: str) -> Dict[str, jnp.ndarray]:
    out = {"w": _arr(hf[base + ".weight"]).astype(jnp.float32)}
    if base + ".bias" in hf:
        out["b"] = _arr(hf[base + ".bias"]).astype(jnp.float32)
    return out


def _lin(hf: Mapping, base: str) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    b = _arr(hf[base + ".bias"]) if base + ".bias" in hf else None
    return _t(hf[base + ".weight"]), b


def _cat(parts, biases):
    w = jnp.concatenate(parts, axis=1)
    b = None
    if any(x is not None for x in biases):
        b = jnp.concatenate([x if x is not None else
                             jnp.zeros((p.shape[1],), p.dtype)
                             for x, p in zip(biases, parts)])
    return w, b


def _split_interleaved_qkv(w, b, num_heads: int, head_dim: int):
    """(3*H*D, in) rows ordered (H, [q|k|v], D) -> kernel-layout fused qkv."""
    nin = w.shape[1]
    w3 = _arr(w).reshape(num_heads, 3, head_dim, nin)
    parts = [w3[:, j].reshape(num_heads * head_dim, nin).T for j in range(3)]
    bs = [None] * 3
    if b is not None:
        b3 = _arr(b).reshape(num_heads, 3, head_dim)
        bs = [b3[:, j].reshape(-1) for j in range(3)]
    return _cat(parts, bs)


def _split_grouped_qkv(w, b, num_kv: int, q_per_group: int, head_dim: int):
    """Falcon new_decoder_architecture rows (n_kv, [q*g|k|v], D)."""
    nin = w.shape[1]
    g = q_per_group
    w4 = _arr(w).reshape(num_kv, g + 2, head_dim, nin)
    q = w4[:, :g].reshape(num_kv * g * head_dim, nin).T
    k = w4[:, g].reshape(num_kv * head_dim, nin).T
    v = w4[:, g + 1].reshape(num_kv * head_dim, nin).T
    bs = [None] * 3
    if b is not None:
        b4 = _arr(b).reshape(num_kv, g + 2, head_dim)
        bs = [b4[:, :g].reshape(-1), b4[:, g].reshape(-1),
              b4[:, g + 1].reshape(-1)]
    return _cat([q, k, v], bs)


# ---------------------------------------------------------------------------
# Config translation
# ---------------------------------------------------------------------------

def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()
                   ) -> ModelConfig:
    """transformers config -> ModelConfig for the non-llama families."""
    mt = hf_config.model_type.lower()
    g = lambda name, d=None: getattr(hf_config, name, d)

    if mt == "opt":
        assert g("do_layer_norm_before", True), \
            "OPT-350m post-norm variant unsupported"
        assert g("word_embed_proj_dim", hf_config.hidden_size) == \
            hf_config.hidden_size, "OPT embed projection unsupported"
        return ModelConfig(
            arch="opt", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.ffn_dim,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            head_dim=hf_config.hidden_size // hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            rms_norm_eps=1e-5, norm_type="layernorm",
            pos_embedding="learned", learned_pos_offset=2,
            mlp_type="dense", hidden_act=g("activation_function", "relu"),
            qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            tie_word_embeddings=g("tie_word_embeddings", True), quant=quant)

    if mt == "gpt2":
        inner = g("n_inner") or 4 * hf_config.n_embd
        return ModelConfig(
            arch="gpt2", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd, intermediate_size=inner,
            num_layers=hf_config.n_layer, num_heads=hf_config.n_head,
            num_kv_heads=hf_config.n_head,
            head_dim=hf_config.n_embd // hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            rms_norm_eps=g("layer_norm_epsilon", 1e-5),
            norm_type="layernorm", pos_embedding="learned",
            mlp_type="dense", hidden_act=g("activation_function", "gelu_new"),
            qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            tie_word_embeddings=True, quant=quant)

    if mt == "gptj":
        inner = g("n_inner") or 4 * hf_config.n_embd
        return ModelConfig(
            arch="gptj", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd, intermediate_size=inner,
            num_layers=hf_config.n_layer, num_heads=hf_config.n_head,
            num_kv_heads=hf_config.n_head,
            head_dim=hf_config.n_embd // hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            rms_norm_eps=g("layer_norm_epsilon", 1e-5),
            norm_type="layernorm", rotary_dim=g("rotary_dim") or 0,
            rope_interleaved=True, parallel_blocks=True,
            shared_block_norm=True, mlp_type="dense",
            hidden_act=g("activation_function", "gelu_new"),
            mlp_bias=True, lm_head_bias=True, quant=quant)

    if mt == "gpt_neox":
        head_dim = hf_config.hidden_size // hf_config.num_attention_heads
        return ModelConfig(
            arch="gpt_neox", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads, head_dim=head_dim,
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rotary_emb_base", 10000.0),
            rms_norm_eps=g("layer_norm_eps", 1e-5), norm_type="layernorm",
            rotary_dim=int(head_dim * g("rotary_pct", 0.25)),
            parallel_blocks=bool(g("use_parallel_residual", True)),
            mlp_type="dense", hidden_act=g("hidden_act", "gelu"),
            qkv_bias=True, attn_out_bias=True, mlp_bias=True, quant=quant)

    if mt in ("falcon", "refinedweb", "refinedwebmodel"):
        h = hf_config.num_attention_heads
        if g("new_decoder_architecture", False):
            n_kv = g("num_kv_heads") or h
        else:
            n_kv = 1 if g("multi_query", True) else h
        parallel = bool(g("parallel_attn", True))
        return ModelConfig(
            arch="falcon", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=g("ffn_hidden_size")
            or 4 * hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers, num_heads=h,
            num_kv_heads=n_kv, head_dim=hf_config.hidden_size // h,
            max_position_embeddings=g("max_position_embeddings", 2048),
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=g("layer_norm_epsilon", 1e-5),
            norm_type="layernorm",
            pos_embedding="alibi" if g("alibi", False) else "rope",
            parallel_blocks=parallel,
            shared_block_norm=parallel
            and not g("new_decoder_architecture", False),
            mlp_type="dense", hidden_act=g("activation", "gelu"),
            qkv_bias=bool(g("bias", False)),
            attn_out_bias=bool(g("bias", False)),
            mlp_bias=bool(g("bias", False)),
            tie_word_embeddings=True, quant=quant)

    if mt == "bloom":
        h = hf_config.n_head
        return ModelConfig(
            arch="bloom", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=4 * hf_config.hidden_size,
            num_layers=hf_config.n_layer, num_heads=h, num_kv_heads=h,
            head_dim=hf_config.hidden_size // h,
            max_position_embeddings=g("seq_length", 2048),
            rms_norm_eps=g("layer_norm_epsilon", 1e-5),
            norm_type="layernorm", pos_embedding="alibi", embed_norm=True,
            mlp_type="dense", hidden_act="gelu_tanh",
            qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            tie_word_embeddings=True, quant=quant)

    if mt == "mpt":
        attn_cfg = g("attn_config", None)
        alibi = bool(getattr(attn_cfg, "alibi", True)) if attn_cfg is not None \
            else True
        no_bias = bool(g("no_bias", True))
        return ModelConfig(
            arch="mpt", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.d_model,
            intermediate_size=int(g("expansion_ratio", 4)
                                  * hf_config.d_model),
            num_layers=hf_config.n_layers, num_heads=hf_config.n_heads,
            num_kv_heads=hf_config.n_heads,
            head_dim=hf_config.d_model // hf_config.n_heads,
            max_position_embeddings=g("max_seq_len", 2048),
            rms_norm_eps=g("layer_norm_epsilon", 1e-5),
            norm_type="layernorm",
            pos_embedding="alibi" if alibi else "learned",
            mlp_type="dense", hidden_act="gelu",
            qkv_bias=not no_bias, attn_out_bias=not no_bias,
            mlp_bias=not no_bias, tie_word_embeddings=True, quant=quant)

    if mt == "phi":
        head_dim = hf_config.hidden_size // hf_config.num_attention_heads
        return ModelConfig(
            arch="phi", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=head_dim,
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=g("layer_norm_eps", 1e-5), norm_type="layernorm",
            rotary_dim=int(head_dim * g("partial_rotary_factor", 0.5)),
            parallel_blocks=True, shared_block_norm=True,
            mlp_type="dense", hidden_act=g("hidden_act", "gelu_new"),
            qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            lm_head_bias=True, quant=quant)

    if mt == "phi3":
        # Phi-3 (HF Phi3Config): llama structure with HF-side fused qkv
        # and gate_up weights, sliding window, no biases. longrope
        # checkpoints (128k) pick the long/short per-dim factor set ONCE
        # at config time by whether the serving context exceeds the
        # original window (HF picks per forward by seq_len; a static
        # graph picks per deployment — identical whenever all sequences
        # sit on one side of the original window).
        rope_extra = {}
        rs = g("rope_scaling")
        if rs is not None:
            import math
            assert rs.get("rope_type", rs.get("type")) == "longrope", rs
            orig = g("original_max_position_embeddings") \
                or hf_config.max_position_embeddings
            factor = hf_config.max_position_embeddings / orig
            long_ctx = hf_config.max_position_embeddings > orig
            ext = rs["long_factor"] if long_ctx else rs["short_factor"]
            af = rs.get("attention_factor")
            if af is None:
                af = 1.0 if factor <= 1.0 else math.sqrt(
                    1 + math.log(factor) / math.log(orig))
            rope_extra = dict(rope_scaling_type="longrope",
                              rope_freq_factors=tuple(float(x) for x in ext),
                              rope_attention_factor=float(af))
        head_dim = hf_config.hidden_size // hf_config.num_attention_heads
        return ModelConfig(
            arch="phi3", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=head_dim,
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            rotary_dim=int(head_dim * g("partial_rotary_factor", 1.0))
            if g("partial_rotary_factor", 1.0) != 1.0 else 0,
            sliding_window=g("sliding_window", 0) or 0,
            tie_word_embeddings=g("tie_word_embeddings", False),
            quant=quant, **rope_extra)

    if mt == "dbrx":
        # DBRX (HF DbrxConfig): nested attn/ffn configs, fused Wqkv with
        # ±clip_qkv clamp, bias-free LayerNorms, 16-expert top-4 GLU MoE
        # with p=1 router renormalization (same math as Mixtral renorm)
        ac, fc = hf_config.attn_config, hf_config.ffn_config
        act = getattr(fc, "ffn_act_fn", None) or {}
        assert act.get("name", "silu") == "silu", act
        p = getattr(fc, "moe_normalize_expert_weights", 1.0)
        assert p in (None, 1, 1.0), \
            f"only p=1 (sum) router renormalization supported, got {p}"
        h = hf_config.n_heads
        return ModelConfig(
            arch="dbrx", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.d_model,
            intermediate_size=fc.ffn_hidden_size,
            num_layers=hf_config.n_layers, num_heads=h,
            num_kv_heads=getattr(ac, "kv_n_heads", h),
            head_dim=hf_config.d_model // h,
            max_position_embeddings=hf_config.max_seq_len,
            rope_theta=getattr(ac, "rope_theta", 10000.0),
            rms_norm_eps=1e-5, norm_type="layernorm",
            clip_qkv=getattr(ac, "clip_qkv", 0.0) or 0.0,
            num_experts=fc.moe_num_experts,
            top_k_experts=fc.moe_top_k,
            moe_norm_topk=p is not None,
            tie_word_embeddings=g("tie_word_embeddings", False),
            quant=quant)

    if mt == "gemma":
        return ModelConfig(
            arch="gemma", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=g("head_dim") or (hf_config.hidden_size
                                       // hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            hidden_act=g("hidden_activation") or g("hidden_act")
            or "gelu_tanh",
            embed_scale=float(hf_config.hidden_size) ** 0.5,
            tie_word_embeddings=True, quant=quant)

    if mt == "gemma2":
        return ModelConfig(
            arch="gemma2", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=g("head_dim") or (hf_config.hidden_size
                                       // hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            hidden_act=g("hidden_activation", "gelu_pytorch_tanh"),
            embed_scale=float(hf_config.hidden_size) ** 0.5,
            # 1/sqrt(query_pre_attn_scalar) replaces 1/sqrt(head_dim)
            attn_scale=float(g("query_pre_attn_scalar",
                               256)) ** -0.5,
            attn_logit_softcap=g("attn_logit_softcapping", 0.0) or 0.0,
            final_logit_softcap=g("final_logit_softcapping", 0.0) or 0.0,
            post_block_norms=True,
            # even layers sliding, odd global (HF Gemma2: is_sliding =
            # not bool(layer_idx % 2))
            sliding_window=g("sliding_window", 0) or 0,
            sliding_window_pattern=2,
            tie_word_embeddings=True, quant=quant)

    if mt == "qwen3":
        return ModelConfig(
            arch="qwen3", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=g("head_dim") or (hf_config.hidden_size
                                       // hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            qk_norm=True,
            sliding_window=(g("sliding_window", 0) or 0)
            if g("use_sliding_window", False) else 0,
            tie_word_embeddings=g("tie_word_embeddings", False),
            quant=quant)

    if mt in ("qwen2_moe", "qwen3_moe"):
        # HF Qwen2MoeSparseMoeBlock / Qwen3MoeSparseMoeBlock: top-k router
        # with optional renorm; qwen2_moe adds a sigmoid-gated shared
        # expert; qwen3_moe adds per-head qk-norm. Homogeneous MoE stacks
        # only (every layer sparse) — the default for both families.
        if g("mlp_only_layers") or (g("decoder_sparse_step", 1) or 1) != 1:
            raise NotImplementedError(
                "mixed dense/MoE layer stacks are not supported")
        return ModelConfig(
            arch=mt, vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=g("head_dim") or (hf_config.hidden_size
                                       // hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            num_experts=hf_config.num_experts,
            top_k_experts=hf_config.num_experts_per_tok,
            moe_norm_topk=bool(g("norm_topk_prob", False)),
            moe_intermediate=g("moe_intermediate_size", 0) or 0,
            moe_shared_intermediate=(
                g("shared_expert_intermediate_size", 0) or 0
                if mt == "qwen2_moe" else 0),
            qkv_bias=(mt == "qwen2_moe"),
            qk_norm=(mt == "qwen3_moe"),
            sliding_window=(g("sliding_window", 0) or 0)
            if g("use_sliding_window", False) else 0,
            tie_word_embeddings=g("tie_word_embeddings", False),
            quant=quant)

    if mt in ("glm", "glm4"):
        # GLM-4 family (HF GlmConfig/Glm4Config): partial INTERLEAVED
        # rotary, qkv bias, fused gate_up weight; glm4 adds Gemma-2-style
        # post-block norms (post_self_attn/post_mlp_layernorm)
        head_dim = g("head_dim") or (hf_config.hidden_size
                                     // hf_config.num_attention_heads)
        return ModelConfig(
            arch=mt, vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=head_dim,
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            rotary_dim=int(head_dim * g("partial_rotary_factor", 0.5)),
            rope_interleaved=True,
            qkv_bias=g("attention_bias", True),
            post_block_norms=(mt == "glm4"),
            tie_word_embeddings=g("tie_word_embeddings", False),
            quant=quant)

    if mt == "olmo2":
        # OLMo-2 (HF Olmo2DecoderLayer): NO pre-norms — RMSNorm on the
        # attn/MLP OUTPUTS before the residual adds; flat q/k RMSNorm
        return ModelConfig(
            arch="olmo2", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=g("head_dim") or (hf_config.hidden_size
                                       // hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            pre_block_norms=False, post_block_norms=True,
            qk_norm=True, qk_norm_flat=True,
            tie_word_embeddings=g("tie_word_embeddings", False),
            quant=quant)

    if mt == "cohere":
        # Command-R (HF CohereDecoderLayer): parallel attn+mlp sharing ONE
        # bias-free LayerNorm, full interleaved rotary, scaled tied logits
        return ModelConfig(
            arch="cohere", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=g("head_dim") or (hf_config.hidden_size
                                       // hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=g("layer_norm_eps", 1e-5), norm_type="layernorm",
            rope_interleaved=True,
            parallel_blocks=True, shared_block_norm=True,
            qkv_bias=g("attention_bias", False),
            attn_out_bias=g("attention_bias", False),
            logit_scale=g("logit_scale", 1.0),
            tie_word_embeddings=True, quant=quant)

    if mt == "granite":
        # Granite (HF GraniteForCausalLM): llama structure + the four
        # scalar multipliers (embedding/residual/attention/logits)
        return ModelConfig(
            arch="granite", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=g("head_dim") or (hf_config.hidden_size
                                       // hf_config.num_attention_heads),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=hf_config.rms_norm_eps,
            embed_scale=g("embedding_multiplier", 1.0),
            residual_multiplier=g("residual_multiplier", 1.0),
            attn_scale=g("attention_multiplier", 0.0) or 0.0,
            logit_scale=1.0 / g("logits_scaling", 1.0),
            qkv_bias=g("attention_bias", False),
            attn_out_bias=g("attention_bias", False),
            mlp_bias=g("mlp_bias", False),
            tie_word_embeddings=g("tie_word_embeddings", False),
            quant=quant)

    if mt == "gpt_bigcode":     # santacoder / starcoder1 (MQA gpt2)
        inner = g("n_inner") or 4 * hf_config.n_embd
        return ModelConfig(
            arch="gpt_bigcode", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd, intermediate_size=inner,
            num_layers=hf_config.n_layer, num_heads=hf_config.n_head,
            num_kv_heads=1 if g("multi_query", True) else hf_config.n_head,
            head_dim=hf_config.n_embd // hf_config.n_head,
            max_position_embeddings=hf_config.n_positions,
            rms_norm_eps=g("layer_norm_epsilon", 1e-5),
            norm_type="layernorm", pos_embedding="learned",
            mlp_type="dense",
            hidden_act=g("activation_function", "gelu_pytorch_tanh"),
            qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            tie_word_embeddings=True, quant=quant)

    if mt == "starcoder2":
        return ModelConfig(
            arch="starcoder2", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=hf_config.hidden_size // hf_config.num_attention_heads,
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=g("norm_epsilon", 1e-5), norm_type="layernorm",
            mlp_type="dense", hidden_act=g("hidden_act",
                                           "gelu_pytorch_tanh"),
            qkv_bias=bool(g("use_bias", True)),
            attn_out_bias=bool(g("use_bias", True)),
            mlp_bias=bool(g("use_bias", True)),
            tie_word_embeddings=g("tie_word_embeddings", True), quant=quant)

    if mt == "stablelm":
        head_dim = hf_config.hidden_size // hf_config.num_attention_heads
        return ModelConfig(
            arch="stablelm", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=g("num_key_value_heads")
            or hf_config.num_attention_heads,
            head_dim=head_dim,
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_theta=g("rope_theta", 10000.0),
            rms_norm_eps=g("layer_norm_eps", 1e-5), norm_type="layernorm",
            rotary_dim=int(head_dim * g("partial_rotary_factor", 0.25)),
            hidden_act=g("hidden_act", "silu"),
            qkv_bias=bool(g("use_qkv_bias", False)), quant=quant)

    if mt == "baichuan":
        # 7B ships RoPE; 13B ships ALiBi (known released geometries; the
        # checkpoint config carries no explicit flag)
        alibi = g("position_embedding", None) == "alibi" or \
            hf_config.hidden_size >= 5120
        return ModelConfig(
            arch="baichuan", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            head_dim=hf_config.hidden_size // hf_config.num_attention_heads,
            max_position_embeddings=g("max_position_embeddings", 4096),
            rms_norm_eps=hf_config.rms_norm_eps,
            pos_embedding="alibi" if alibi else "rope",
            tie_word_embeddings=g("tie_word_embeddings", False), quant=quant)

    raise ValueError(f"families.config_from_hf: unknown model_type {mt!r}")


# ---------------------------------------------------------------------------
# Weight extraction (HF state dict -> uniform float layer dicts)
# ---------------------------------------------------------------------------

def _float_layer(cfg: ModelConfig, hf: Mapping, i: int) -> Dict:
    a = cfg.arch
    if a == "opt":
        p = f"model.decoder.layers.{i}."
        qkv = _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                          for n in "qkv"]))
        return {
            "qkv_proj": qkv, "o_proj": _lin(hf, p + "self_attn.out_proj"),
            "gate_up_proj": _lin(hf, p + "fc1"),
            "down_proj": _lin(hf, p + "fc2"),
            "input_norm": _norm(hf, p + "self_attn_layer_norm"),
            "post_norm": _norm(hf, p + "final_layer_norm"),
        }
    if a == "gpt2":
        p = f"transformer.h.{i}."
        cw = _arr(hf[p + "attn.c_attn.weight"])    # Conv1D: (in, 3*out)
        cb = _arr(hf[p + "attn.c_attn.bias"])
        return {
            "qkv_proj": (cw, cb),
            "o_proj": (_arr(hf[p + "attn.c_proj.weight"]),
                       _arr(hf[p + "attn.c_proj.bias"])),
            "gate_up_proj": (_arr(hf[p + "mlp.c_fc.weight"]),
                             _arr(hf[p + "mlp.c_fc.bias"])),
            "down_proj": (_arr(hf[p + "mlp.c_proj.weight"]),
                          _arr(hf[p + "mlp.c_proj.bias"])),
            "input_norm": _norm(hf, p + "ln_1"),
            "post_norm": _norm(hf, p + "ln_2"),
        }
    if a == "gptj":
        p = f"transformer.h.{i}."
        qkv = _cat(*zip(*[_lin(hf, p + f"attn.{n}_proj") for n in "qkv"]))
        return {
            "qkv_proj": qkv, "o_proj": _lin(hf, p + "attn.out_proj"),
            "gate_up_proj": _lin(hf, p + "mlp.fc_in"),
            "down_proj": _lin(hf, p + "mlp.fc_out"),
            "input_norm": _norm(hf, p + "ln_1"),
        }
    if a == "gpt_neox":
        p = f"gpt_neox.layers.{i}."
        w = _arr(hf[p + "attention.query_key_value.weight"])
        b = hf.get(p + "attention.query_key_value.bias")
        return {
            "qkv_proj": _split_interleaved_qkv(w, b, cfg.num_heads,
                                               cfg.head_dim),
            "o_proj": _lin(hf, p + "attention.dense"),
            "gate_up_proj": _lin(hf, p + "mlp.dense_h_to_4h"),
            "down_proj": _lin(hf, p + "mlp.dense_4h_to_h"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
    if a == "falcon":
        p = f"transformer.h.{i}."
        w = _arr(hf[p + "self_attention.query_key_value.weight"])
        b = hf.get(p + "self_attention.query_key_value.bias")
        if cfg.num_kv_heads == cfg.num_heads and \
                w.shape[0] == 3 * cfg.hidden_size and not cfg.parallel_blocks:
            qkv = _split_interleaved_qkv(w, b, cfg.num_heads, cfg.head_dim)
        elif cfg.num_kv_heads == 1:
            qkv = (_arr(w).T, _arr(b) if b is not None else None)
        else:
            qkv = _split_grouped_qkv(w, b, cfg.num_kv_heads,
                                     cfg.num_heads // cfg.num_kv_heads,
                                     cfg.head_dim)
        out = {
            "qkv_proj": qkv,
            "o_proj": _lin(hf, p + "self_attention.dense"),
            "gate_up_proj": _lin(hf, p + "mlp.dense_h_to_4h"),
            "down_proj": _lin(hf, p + "mlp.dense_4h_to_h"),
        }
        if p + "ln_attn.weight" in hf:    # new_decoder_architecture
            out["input_norm"] = _norm(hf, p + "ln_attn")
            out["post_norm"] = _norm(hf, p + "ln_mlp")
        else:
            out["input_norm"] = _norm(hf, p + "input_layernorm")
            if p + "post_attention_layernorm.weight" in hf:
                out["post_norm"] = _norm(hf, p + "post_attention_layernorm")
        return out
    if a == "bloom":
        p = f"transformer.h.{i}."
        w = _arr(hf[p + "self_attention.query_key_value.weight"])
        b = hf.get(p + "self_attention.query_key_value.bias")
        return {
            "qkv_proj": _split_interleaved_qkv(w, b, cfg.num_heads,
                                               cfg.head_dim),
            "o_proj": _lin(hf, p + "self_attention.dense"),
            "gate_up_proj": _lin(hf, p + "mlp.dense_h_to_4h"),
            "down_proj": _lin(hf, p + "mlp.dense_4h_to_h"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
    if a == "mpt":
        p = f"transformer.blocks.{i}."
        w = _arr(hf[p + "attn.Wqkv.weight"])
        b = hf.get(p + "attn.Wqkv.bias")
        return {
            "qkv_proj": (w.T, _arr(b) if b is not None else None),
            "o_proj": _lin(hf, p + "attn.out_proj"),
            "gate_up_proj": _lin(hf, p + "ffn.up_proj"),
            "down_proj": _lin(hf, p + "ffn.down_proj"),
            "input_norm": _norm(hf, p + "norm_1"),
            "post_norm": _norm(hf, p + "norm_2"),
        }
    if a == "phi":
        p = f"model.layers.{i}."
        qkv = _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                          for n in "qkv"]))
        return {
            "qkv_proj": qkv, "o_proj": _lin(hf, p + "self_attn.dense"),
            "gate_up_proj": _lin(hf, p + "mlp.fc1"),
            "down_proj": _lin(hf, p + "mlp.fc2"),
            "input_norm": _norm(hf, p + "input_layernorm"),
        }
    if a == "phi3":
        p = f"model.layers.{i}."
        return {
            # HF Phi3 ships qkv and gate_up already fused, in our ordering
            # ([q|k|v] and [gate|up] contiguous on the out dim)
            "qkv_proj": _lin(hf, p + "self_attn.qkv_proj"),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _lin(hf, p + "mlp.gate_up_proj"),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
    if a == "dbrx":
        p = f"transformer.blocks.{i}."
        e, ffn = cfg.num_experts, cfg.intermediate_size
        d = cfg.hidden_size
        # DbrxExpertGLU stores w1/v1/w2 as flat (E*ffn, d) parameters;
        # w1/v1 multiply as x @ w.T (-> transpose into kernel layout),
        # w2 as (x1*x2) @ w2 (already kernel layout (ffn, d))
        w1 = _arr(hf[p + "ffn.experts.mlp.w1"]).reshape(e, ffn, d)
        v1 = _arr(hf[p + "ffn.experts.mlp.v1"]).reshape(e, ffn, d)
        w2 = _arr(hf[p + "ffn.experts.mlp.w2"]).reshape(e, ffn, d)
        return {
            "qkv_proj": _lin(hf, p + "norm_attn_norm.attn.Wqkv"),
            "o_proj": _lin(hf, p + "norm_attn_norm.attn.out_proj"),
            "input_norm": _norm(hf, p + "norm_attn_norm.norm_1"),
            "post_norm": _norm(hf, p + "norm_attn_norm.norm_2"),
            "router_w": _t(hf[p + "ffn.router.layer.weight"]),
            "experts_gate_up": jnp.concatenate(
                [jnp.swapaxes(w1, 1, 2), jnp.swapaxes(v1, 1, 2)], axis=2),
            "experts_down": w2,
        }
    if a == "gemma":
        p = f"model.layers.{i}."
        fl = {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
        # Gemma RMSNorm computes x * (1 + w): fold the +1 into the stored
        # weight so the shared decoder's plain RMSNorm applies unchanged
        for k in ("input_norm", "post_norm"):
            fl[k] = {"w": fl[k]["w"] + 1.0}
        return fl
    if a == "gemma2":
        p = f"model.layers.{i}."
        fl = {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            # pre_feedforward_layernorm is the shared decoder's mlp input
            # norm slot; the two post-block norms are Gemma-2-specific
            "post_norm": _norm(hf, p + "pre_feedforward_layernorm"),
            "post_attn_norm": _norm(hf, p + "post_attention_layernorm"),
            "post_mlp_norm": _norm(hf, p + "post_feedforward_layernorm"),
        }
        for k in ("input_norm", "post_norm", "post_attn_norm",
                  "post_mlp_norm"):
            fl[k] = {"w": fl[k]["w"] + 1.0}    # Gemma (1 + w) RMSNorm
        return fl
    if a == "qwen3":
        p = f"model.layers.{i}."
        return {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
            "q_norm": _norm(hf, p + "self_attn.q_norm"),
            "k_norm": _norm(hf, p + "self_attn.k_norm"),
        }
    if a in ("qwen2_moe", "qwen3_moe"):
        p = f"model.layers.{i}."
        fl = {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
            "router_w": _t(hf[p + "mlp.gate.weight"]),
            "experts_gate_up": jnp.stack([
                jnp.concatenate(
                    [_t(hf[p + f"mlp.experts.{e}.gate_proj.weight"]),
                     _t(hf[p + f"mlp.experts.{e}.up_proj.weight"])], axis=1)
                for e in range(cfg.num_experts)]),
            "experts_down": jnp.stack([
                _t(hf[p + f"mlp.experts.{e}.down_proj.weight"])
                for e in range(cfg.num_experts)]),
        }
        if a == "qwen3_moe":
            fl["q_norm"] = _norm(hf, p + "self_attn.q_norm")
            fl["k_norm"] = _norm(hf, p + "self_attn.k_norm")
        if cfg.moe_shared_intermediate:
            fl["shared_gate_up_w"] = _cat(
                *zip(*[_lin(hf, p + f"mlp.shared_expert.{n}_proj")
                       for n in ("gate", "up")]))
            fl["shared_down_w"] = _lin(hf, p + "mlp.shared_expert.down_proj")
            fl["shared_gate_w"] = _t(hf[p + "mlp.shared_expert_gate.weight"])
        return fl
    if a in ("glm", "glm4"):
        p = f"model.layers.{i}."
        fl = {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            # HF stores gate_up fused already (GlmMLP.gate_up_proj; gate is
            # the first chunk — matches our gated split)
            "gate_up_proj": _lin(hf, p + "mlp.gate_up_proj"),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
        if a == "glm4":
            fl["post_attn_norm"] = _norm(hf, p + "post_self_attn_layernorm")
            fl["post_mlp_norm"] = _norm(hf, p + "post_mlp_layernorm")
        return fl
    if a == "olmo2":
        p = f"model.layers.{i}."
        return {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            # no pre-norms: both norms apply to block OUTPUTS
            "post_attn_norm": _norm(hf, p + "post_attention_layernorm"),
            "post_mlp_norm": _norm(hf, p + "post_feedforward_layernorm"),
            "q_norm": _norm(hf, p + "self_attn.q_norm"),
            "k_norm": _norm(hf, p + "self_attn.k_norm"),
        }
    if a == "cohere":
        p = f"model.layers.{i}."
        return {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            # ONE shared norm feeds both parallel blocks
            "input_norm": _norm(hf, p + "input_layernorm"),
        }
    if a == "granite":
        p = f"model.layers.{i}."
        return {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
    if a == "gpt_bigcode":
        p = f"transformer.h.{i}."
        return {
            # nn.Linear (unlike gpt2's Conv1D): transpose; contiguous
            # [q, k, v] rows for both MQA and MHA variants
            "qkv_proj": _lin(hf, p + "attn.c_attn"),
            "o_proj": _lin(hf, p + "attn.c_proj"),
            "gate_up_proj": _lin(hf, p + "mlp.c_fc"),
            "down_proj": _lin(hf, p + "mlp.c_proj"),
            "input_norm": _norm(hf, p + "ln_1"),
            "post_norm": _norm(hf, p + "ln_2"),
        }
    if a == "starcoder2":
        p = f"model.layers.{i}."
        return {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _lin(hf, p + "mlp.c_fc"),
            "down_proj": _lin(hf, p + "mlp.c_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
    if a == "stablelm":
        p = f"model.layers.{i}."
        return {
            "qkv_proj": _cat(*zip(*[_lin(hf, p + f"self_attn.{n}_proj")
                                    for n in "qkv"])),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
    if a == "baichuan":
        p = f"model.layers.{i}."
        w = _arr(hf[p + "self_attn.W_pack.weight"])
        return {
            "qkv_proj": (w.T, None),
            "o_proj": _lin(hf, p + "self_attn.o_proj"),
            "gate_up_proj": _cat(
                *zip(*[_lin(hf, p + f"mlp.{n}_proj")
                       for n in ("gate", "up")])),
            "down_proj": _lin(hf, p + "mlp.down_proj"),
            "input_norm": _norm(hf, p + "input_layernorm"),
            "post_norm": _norm(hf, p + "post_attention_layernorm"),
        }
    raise ValueError(f"no layer extractor for arch {cfg.arch!r}")


_TOPLEVEL = {
    # arch: (embed, pos_embed, embed_norm, final_norm, lm_head)
    "opt": ("model.decoder.embed_tokens", "model.decoder.embed_positions",
            None, "model.decoder.final_layer_norm", "lm_head"),
    "gpt2": ("transformer.wte", "transformer.wpe", None, "transformer.ln_f",
             None),
    "gptj": ("transformer.wte", None, None, "transformer.ln_f", "lm_head"),
    "gpt_neox": ("gpt_neox.embed_in", None, None,
                 "gpt_neox.final_layer_norm", "embed_out"),
    "falcon": ("transformer.word_embeddings", None, None, "transformer.ln_f",
               None),
    "bloom": ("transformer.word_embeddings", None,
              "transformer.word_embeddings_layernorm", "transformer.ln_f",
              None),
    "mpt": ("transformer.wte", None, None, "transformer.norm_f", None),
    "phi": ("model.embed_tokens", None, None, "model.final_layernorm",
            "lm_head"),
    "phi3": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
    "dbrx": ("transformer.wte", None, None, "transformer.norm_f",
             "lm_head"),
    "gemma": ("model.embed_tokens", None, None, "model.norm", None),
    "gemma2": ("model.embed_tokens", None, None, "model.norm", None),
    "qwen3": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
    "qwen2_moe": ("model.embed_tokens", None, None, "model.norm",
                  "lm_head"),
    "qwen3_moe": ("model.embed_tokens", None, None, "model.norm",
                  "lm_head"),
    "glm": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
    "glm4": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
    "olmo2": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
    "cohere": ("model.embed_tokens", None, None, "model.norm", None),
    "granite": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
    "baichuan": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
    "gpt_bigcode": ("transformer.wte", "transformer.wpe", None,
                    "transformer.ln_f", None),
    "starcoder2": ("model.embed_tokens", None, None, "model.norm",
                   "lm_head"),
    "stablelm": ("model.embed_tokens", None, None, "model.norm", "lm_head"),
}


def _quantize_layer(cfg: ModelConfig, fl: Dict, act_scales, i: int) -> Dict:
    """Uniform float layer dict -> quantized params (same routing as llama)."""
    from .llama import act_scale_for

    _MOE_RAW = ("router_w", "experts_gate_up", "experts_down",
                "shared_gate_up_w", "shared_down_w", "shared_gate_w")
    # carry every non-linear entry through as-is (norms incl. Gemma-2
    # post-block norms and Qwen3 q/k norms)
    out: Dict = {k: v for k, v in fl.items()
                 if k not in LINEAR_MODULES and k not in _MOE_RAW}
    if "router_w" in fl:
        from . import moe as moe_mod
        algo = cfg.module_algo("gate_up_proj")
        if algo.is_mix:   # experts run weight-only (reference routing)
            algo = (QuantAlgo.W8A16 if algo == QuantAlgo.INT8_MIX
                    else QuantAlgo.W4A16)
        moe = {
            "router": {"w": jnp.asarray(fl["router_w"], jnp.bfloat16)},
            "gate_up": moe_mod.quantize_expert_linear(
                jnp.asarray(fl["experts_gate_up"], jnp.float32), algo, cfg.quant.group_size),
            "down": moe_mod.quantize_expert_linear(
                jnp.asarray(fl["experts_down"], jnp.float32), algo, cfg.quant.group_size),
        }
        if "shared_gate_up_w" in fl:
            for src, dst in (("shared_gate_up_w", "shared_gate_up"),
                             ("shared_down_w", "shared_down")):
                w, b = fl[src]
                moe[dst] = dispatch.quantize_linear_params(
                    jnp.asarray(w, jnp.float32), algo,
                    group_size=cfg.quant.group_size,
                    bias=jnp.asarray(b, jnp.float32)
                    if b is not None else None)
            moe["shared_gate"] = {
                "w": jnp.asarray(fl["shared_gate_w"], jnp.float32)}
        out["moe"] = moe
    for mod in LINEAR_MODULES:
        if mod not in fl:
            continue
        w, b = fl[mod]
        algo = cfg.module_algo(mod)
        scale = act_scale_for(act_scales, i, mod, w.shape[0]) \
            if algo.is_mix else None
        out[mod] = dispatch.quantize_linear_params(
            jnp.asarray(w, jnp.float32), algo, act_scale=scale,
            num_outliers=cfg.quant.num_outliers,
            group_size=cfg.quant.group_size,
            bias=jnp.asarray(b, jnp.float32) if b is not None else None)
    return out


def params_from_hf(cfg: ModelConfig, hf: Mapping[str, np.ndarray],
                   act_scales=None) -> Dict:
    """Full HF state dict -> quantized params pytree for a zoo family."""
    embed, pos_embed, embed_norm, final_norm, lm_head = _TOPLEVEL[cfg.arch]
    layers = [_quantize_layer(cfg, _float_layer(cfg, hf, i), act_scales, i)
              for i in range(cfg.num_layers)]
    gemma_norm = 1.0 if cfg.arch in ("gemma", "gemma2") else 0.0
    params: Dict = {
        "embed": {"w": _arr(hf[embed + ".weight"]).astype(cfg.dtype)},
        "layers": stack_layers(layers),
        "final_norm": {
            "w": _arr(hf[final_norm + ".weight"]).astype(jnp.float32)
            + gemma_norm},
    }
    if final_norm + ".bias" in hf:
        params["final_norm"]["b"] = _arr(
            hf[final_norm + ".bias"]).astype(jnp.float32)
    if pos_embed is not None:
        params["pos_embed"] = {
            "w": _arr(hf[pos_embed + ".weight"]).astype(cfg.dtype)}
    if embed_norm is not None:
        params["embed_norm"] = _norm(hf, embed_norm)
    if lm_head is not None and not cfg.tie_word_embeddings:
        head = {"w": _t(hf[lm_head + ".weight"]).astype(cfg.dtype)}
        if lm_head + ".bias" in hf:
            head["b"] = _arr(hf[lm_head + ".bias"]).astype(jnp.bfloat16)
        params["lm_head"] = head
    return params


def init_random_params(cfg: ModelConfig, key: jax.Array,
                       act_scales=None) -> Dict:
    """Random params honoring every ModelConfig axis (tests/benches)."""
    keys = jax.random.split(key, cfg.num_layers + 4)
    std = 0.02

    def rnd(k, *shape):
        return jax.random.normal(k, shape, jnp.float32) * std

    def norm_init():
        p = {"w": jnp.ones((cfg.hidden_size,), jnp.float32)}
        if cfg.norm_type == "layernorm":
            p["b"] = jnp.zeros((cfg.hidden_size,), jnp.float32)
        return p

    def maybe_b(n, on):
        return jnp.zeros((n,), jnp.float32) if on else None

    up_out = (2 * cfg.intermediate_size if cfg.mlp_type == "gated"
              else cfg.intermediate_size)
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], 4)
        fl = {
            "qkv_proj": (rnd(lk[0], cfg.hidden_size, cfg.qkv_out),
                         maybe_b(cfg.qkv_out, cfg.qkv_bias)),
            "o_proj": (rnd(lk[1], cfg.q_size, cfg.hidden_size),
                       maybe_b(cfg.hidden_size, cfg.attn_out_bias)),
            "gate_up_proj": (rnd(lk[2], cfg.hidden_size, up_out),
                             maybe_b(up_out, cfg.mlp_bias)),
            "down_proj": (rnd(lk[3], cfg.intermediate_size, cfg.hidden_size),
                          maybe_b(cfg.hidden_size, cfg.mlp_bias)),
        }
        if cfg.num_experts > 0:
            del fl["gate_up_proj"], fl["down_proj"]
            mi = cfg.moe_intermediate or cfg.intermediate_size
            ek = jax.random.split(lk[2], 2 * cfg.num_experts + 3)
            fl["router_w"] = rnd(ek[0], cfg.hidden_size, cfg.num_experts)
            fl["experts_gate_up"] = jnp.stack([
                rnd(ek[1 + e], cfg.hidden_size, 2 * mi)
                for e in range(cfg.num_experts)])
            fl["experts_down"] = jnp.stack([
                rnd(ek[1 + cfg.num_experts + e], mi, cfg.hidden_size)
                for e in range(cfg.num_experts)])
            if cfg.moe_shared_intermediate:
                si = cfg.moe_shared_intermediate
                fl["shared_gate_up_w"] = (
                    rnd(ek[-2], cfg.hidden_size, 2 * si), None)
                fl["shared_down_w"] = (rnd(ek[-1], si, cfg.hidden_size),
                                       None)
                fl["shared_gate_w"] = rnd(ek[-2], cfg.hidden_size, 1)
        if cfg.pre_block_norms:
            fl["input_norm"] = norm_init()
            if not cfg.shared_block_norm:
                fl["post_norm"] = norm_init()
        if cfg.post_block_norms:
            fl["post_attn_norm"] = norm_init()
            fl["post_mlp_norm"] = norm_init()
        if cfg.qk_norm:
            qn = cfg.q_size if cfg.qk_norm_flat else cfg.head_dim
            kn = cfg.kv_size if cfg.qk_norm_flat else cfg.head_dim
            fl["q_norm"] = {"w": jnp.ones((qn,), jnp.float32)}
            fl["k_norm"] = {"w": jnp.ones((kn,), jnp.float32)}
        layers.append(_quantize_layer(cfg, fl, act_scales, i))

    params: Dict = {
        "embed": {"w": rnd(keys[-4], cfg.vocab_size,
                           cfg.hidden_size).astype(cfg.dtype)},
        "layers": stack_layers(layers),
        "final_norm": norm_init(),
    }
    if cfg.pos_embedding == "learned":
        params["pos_embed"] = {
            "w": rnd(keys[-3],
                     cfg.max_position_embeddings + cfg.learned_pos_offset,
                     cfg.hidden_size).astype(cfg.dtype)}
    if cfg.embed_norm:
        params["embed_norm"] = norm_init()
    if not cfg.tie_word_embeddings:
        head = {"w": rnd(keys[-2], cfg.hidden_size,
                         cfg.vocab_size).astype(cfg.dtype)}
        if cfg.lm_head_bias:
            head["b"] = jnp.zeros((cfg.vocab_size,), jnp.bfloat16)
        params["lm_head"] = head
    return params
