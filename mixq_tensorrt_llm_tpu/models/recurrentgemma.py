"""RecurrentGemma (Griffin): RG-LRU recurrent blocks + windowed attention.

Reference parity: tensorrt_llm/models/recurrentgemma/ (the reference
zoo's hybrid recurrent/attention family). TPU re-design:

  * Layers follow a repeating block pattern (default recurrent,
    recurrent, attention). The layer loop is a grouped `lax.scan` over
    pattern periods — the same trick the shared decoder uses for
    Gemma-2's alternating windows — so the scan carries THREE
    homogeneous stacked pytrees (attention KV, conv carry, RG-LRU state)
    and compile time stays O(1) in depth.
  * The RG-LRU recurrence h_t = a_t h_{t-1} + sqrt(1-a_t^2) i_t x_t is a
    gated elementwise linear recurrence: prefill runs it as a log-depth
    associative scan (shared combine with models/mamba.py), decode is one
    fused update. The input/recurrence gates are per-head block-diagonal
    linears (one small einsum each).
  * Attention sub-layers reuse the shared dense attention path
    (mcommon._attention_with_cache) with the model-wide sliding window
    and partial rotary embedding.

State rides a dedicated RGState pytree; GenerationSession / LLM drive it
unchanged (init_kv_cache/forward dispatch on cfg.arch). Divergence note:
HF prefill attends FULL causal and only enforces the attention window via
its rolling decode cache (_update_causal_mask builds a plain causal
mask); here the window masks prefill too — the true Griffin local
attention, and consistent with our own decode. Outputs differ from HF
only when a prompt exceeds attention_window_size (2048). Quantization:
qkv/o/gate_up and the recurrent x/y/out projections follow the standard
mix routing; down stays weight-only; the tiny block-diagonal gates stay
float (SURVEY §2.4: only the GEMM bulk gets mixed treatment).
"""

from __future__ import annotations

from typing import Dict, Mapping, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dispatch
from ..quant.config import QuantConfig
from .common import ModelConfig
from .mamba import _scan_combine


class RGState(NamedTuple):
    """Per-pattern-group recurrent + attention state.

    k/v:  (G, A, B, S, Hkv, D) windowed-attention KV (A = attention
          sub-layers per pattern period, G = num_layers / period)
    conv: (G, R, B, K-1, lru) conv carries (R = recurrent sub-layers)
    lru:  (G, R, B, lru) float32 RG-LRU states
    """
    k: jax.Array
    v: jax.Array
    conv: jax.Array
    lru: jax.Array


# pattern encoded in ModelConfig.sliding_window_pattern slots is not
# expressive enough; RG keeps its own axis on the side
RG_PATTERN = ("recurrent", "recurrent", "attention")


def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()
                   ) -> ModelConfig:
    g = lambda name, d=None: getattr(hf_config, name, d)
    pattern = tuple(g("block_types") or RG_PATTERN)
    assert pattern == RG_PATTERN, \
        f"only the ({','.join(RG_PATTERN)}) block pattern is supported"
    assert hf_config.num_hidden_layers % len(pattern) == 0, \
        "num_layers must be a multiple of the block pattern period"
    assert g("lru_width") in (None, hf_config.hidden_size), \
        "lru_width != hidden_size unsupported"
    head_dim = g("head_dim") or (hf_config.hidden_size
                                 // hf_config.num_attention_heads)
    return ModelConfig(
        arch="recurrentgemma", vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size // 2,  # HF halves it
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=g("num_key_value_heads")
        or hf_config.num_attention_heads,
        head_dim=head_dim,
        max_position_embeddings=g("max_position_embeddings", 8192),
        rope_theta=g("rope_theta", 10000.0),
        rms_norm_eps=g("rms_norm_eps", 1e-6),
        rotary_dim=int(head_dim * g("partial_rotary_factor", 0.5)),
        sliding_window=g("attention_window_size", 2048),
        hidden_act=g("hidden_activation", "gelu_tanh"),
        qkv_bias=bool(g("attention_bias", False)),
        attn_out_bias=True,                      # o_proj bias is always on
        mlp_bias=True,
        embed_scale=float(hf_config.hidden_size) ** 0.5,
        final_logit_softcap=g("logits_soft_cap", 30.0),
        conv_kernel=g("conv1d_width", 4),
        tie_word_embeddings=True, quant=quant)


def _counts() -> Tuple[int, int]:
    a = sum(1 for t in RG_PATTERN if t == "attention")
    return len(RG_PATTERN) - a, a           # (recurrent, attention)


def init_state(cfg: ModelConfig, batch: int, max_len: int) -> RGState:
    p = len(RG_PATTERN)
    g = cfg.num_layers // p
    r, a = _counts()
    lru = cfg.hidden_size
    return RGState(
        k=jnp.zeros((g, a, batch, max_len, cfg.num_kv_heads, cfg.head_dim),
                    cfg.dtype),
        v=jnp.zeros((g, a, batch, max_len, cfg.num_kv_heads, cfg.head_dim),
                    cfg.dtype),
        conv=jnp.zeros((g, r, batch, cfg.conv_kernel - 1, lru), cfg.dtype),
        lru=jnp.zeros((g, r, batch, lru), jnp.float32))


def _block_gate(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Per-head block-diagonal linear: x (B,S,lru), w (nh,bw,bw),
    b (nh,bw) -> sigmoid(x_h @ w_h + b_h) flattened back to (B,S,lru)."""
    bsz, s, lru = x.shape
    nh, bw, _ = w.shape
    xh = x.reshape(bsz, s, nh, bw)
    y = jnp.einsum("bshi,hio->bsho", xh, w) + b[None, None]
    return jax.nn.sigmoid(y).reshape(bsz, s, lru)


def _rg_lru(lp: Dict, x: jax.Array, state: jax.Array, pos: jax.Array,
            mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """RG-LRU over x (B,S,lru) f32 from `state` (B,lru) f32.

    pos (B,S) absolute positions (reset at 0); mask (B,S) valid tokens
    (pads are identity updates). Returns (hidden (B,S,lru), new state)."""
    igate = _block_gate(x, lp["input_gate_w"], lp["input_gate_b"])
    rgate = _block_gate(x, lp["recurrent_gate_w"], lp["recurrent_gate_b"])
    log_a = -8.0 * rgate * jax.nn.softplus(lp["recurrent_param"])
    a = jnp.exp(log_a)
    reset = pos == 0
    a = jnp.where(reset[..., None], 0.0, a)
    mult = jnp.where(reset[..., None], 1.0,
                     jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2 * log_a), 1e-12)))
    b = x * igate * mult
    a = jnp.where(mask[..., None], a, 1.0)       # pads: h passes through
    b = jnp.where(mask[..., None], b, 0.0)
    if x.shape[1] == 1:
        h = a[:, 0] * state + b[:, 0]
        return h[:, None], h
    pa, pb = jax.lax.associative_scan(_scan_combine, (a, b), axis=1)
    hs = pa * state[:, None] + pb
    return hs, hs[:, -1]


def _recurrent_block(cfg: ModelConfig, lp: Dict, x: jax.Array,
                     conv_state: jax.Array, lru_state: jax.Array,
                     pos: jax.Array, mask: jax.Array, local_valid):
    """HF RecurrentGemmaRecurrentBlock: y = act(linear_y); x' = conv1d
    (linear_x); rg_lru; out = linear_out(lru_out * y)."""
    from .common import _act
    algo_g = cfg.module_algo("gate_up_proj")
    algo_o = cfg.module_algo("o_proj")
    y = _act(cfg.hidden_act,
             dispatch.linear(lp["linear_y"], x, algo_g))        # (B,S,lru) f32
    xb = dispatch.linear(lp["linear_x"], x, algo_g)
    xb = jnp.where(mask[..., None], xb, 0.0).astype(cfg.dtype)

    k = cfg.conv_kernel
    s = x.shape[1]
    xc = jnp.concatenate([conv_state.astype(cfg.dtype), xb], axis=1)
    conv_w = lp["conv_w"].astype(jnp.float32)                   # (K, lru)
    xcf = xc.astype(jnp.float32)
    h = sum(xcf[:, j:j + s, :] * conv_w[j] for j in range(k)) \
        + lp["conv_b"].astype(jnp.float32)
    idx = local_valid[:, None] + jnp.arange(k - 1)[None, :]
    new_conv = jnp.take_along_axis(xc, idx[..., None], axis=1)

    lru_out, new_lru = _rg_lru(lp, h, lru_state, pos, mask)
    out = dispatch.linear(lp["linear_out"],
                          (lru_out * y).astype(cfg.dtype), algo_o)
    return out, new_conv.astype(cfg.dtype), new_lru


def forward(params: Dict, cfg: ModelConfig, tokens: jax.Array,
            write_pos: jax.Array, cache: RGState, valid_len: jax.Array,
            full_prefill: bool = False, **_unused):
    """Full RecurrentGemma forward, common.forward signature."""
    from . import common as mcommon
    b, s = tokens.shape
    x = mcommon._embed(params, cfg, tokens, write_pos)
    sin, cos, _ = mcommon._positional_arrays(cfg, write_pos)
    local_valid = (valid_len - write_pos[:, 0]).astype(jnp.int32)
    mask = jnp.arange(s)[None, :] < local_valid[:, None]

    def one_attention(lp, x_n, kv):
        q = dispatch.linear(lp["qkv_proj"], x_n, cfg.module_algo("qkv_proj"))
        q, k, v = jnp.split(q, [cfg.q_size, cfg.q_size + cfg.kv_size],
                            axis=-1)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = mcommon._apply_positional(cfg, q, sin, cos)
        k = mcommon._apply_positional(cfg, k, sin, cos)
        attn, kv = mcommon._attention_with_cache(
            cfg, q, k, v, kv, write_pos, valid_len,
            full_prefill=full_prefill, layer_window=cfg.sliding_window)
        attn = attn.reshape(b, s, cfg.q_size)
        return dispatch.linear(lp["o_proj"], attn,
                               cfg.module_algo("o_proj")), kv

    from .common import _act

    def body(x, scanned):
        per_pos, att, rec, kvk, kvv, convs, lrus = scanned
        nk, nv, nc, nl = [], [], [], []
        ai = ri = 0
        for j, t in enumerate(RG_PATTERN):
            pp = jax.tree_util.tree_map(lambda a: a[j], per_pos)
            x_n = mcommon.block_norm(cfg, x, pp["temporal_norm"])
            if t == "attention":
                alp = jax.tree_util.tree_map(lambda a: a[ai], att)
                out, kv = one_attention(alp, x_n, {"k": kvk[ai],
                                                   "v": kvv[ai]})
                nk.append(kv["k"])
                nv.append(kv["v"])
                ai += 1
            else:
                rlp = jax.tree_util.tree_map(lambda a: a[ri], rec)
                out, conv, lru = _recurrent_block(
                    cfg, rlp, x_n, convs[ri], lrus[ri], write_pos, mask,
                    local_valid)
                nc.append(conv)
                nl.append(lru)
                ri += 1
            x = x + out.astype(x.dtype)
            h = mcommon.block_norm(cfg, x, pp["channel_norm"])
            up = dispatch.linear(pp["gate_up_proj"], h,
                                 cfg.module_algo("gate_up_proj"))
            gate, upv = jnp.split(up, 2, axis=-1)
            hmlp = (_act(cfg.hidden_act, gate)
                    * upv.astype(jnp.float32)).astype(x.dtype)
            x = x + dispatch.linear(pp["down_proj"], hmlp,
                                    cfg.module_algo("down_proj")
                                    ).astype(x.dtype)
        stack = lambda xs: jnp.stack(xs) if xs else jnp.zeros((0,))
        return x, (stack(nk), stack(nv), stack(nc), stack(nl))

    x, (nk, nv, nc, nl) = jax.lax.scan(
        body, x, (params["per_pos"], params["att"], params["rec"],
                  cache.k, cache.v, cache.conv, cache.lru))
    logits = mcommon._head(params, cfg, x)
    return logits.astype(jnp.float32), RGState(k=nk, v=nv, conv=nc, lru=nl)


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

def _arr(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x))


def _q(cfg: ModelConfig, w, b, route: str, act_scales, i: int):
    from .llama import act_scale_for
    algo = cfg.module_algo(route)
    scale = act_scale_for(act_scales, i, route, w.shape[0]) \
        if algo.is_mix else None
    return dispatch.quantize_linear_params(
        jnp.asarray(w, jnp.float32), algo, act_scale=scale,
        num_outliers=cfg.quant.num_outliers,
        group_size=cfg.quant.group_size,
        bias=jnp.asarray(b, jnp.float32) if b is not None else None)


def _lin(hf: Mapping, base: str):
    b = _arr(hf[base + ".bias"]) if base + ".bias" in hf else None
    return _arr(hf[base + ".weight"]).T, b


def _stack(dicts):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *dicts)


def params_from_hf(cfg: ModelConfig, hf: Mapping[str, np.ndarray],
                   act_scales=None) -> Dict:
    p_len = len(RG_PATTERN)
    g = cfg.num_layers // p_len
    per_pos, att, rec = [], [], []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        # RecurrentGemmaRMSNorm computes x * (1 + w): fold the +1
        per_pos.append({
            "temporal_norm": {
                "w": _arr(hf[pre + "temporal_pre_norm.weight"])
                .astype(jnp.float32) + 1.0},
            "channel_norm": {
                "w": _arr(hf[pre + "channel_pre_norm.weight"])
                .astype(jnp.float32) + 1.0},
            "gate_up_proj": _q(cfg, *(lambda gw, uw: (
                jnp.concatenate([gw[0], uw[0]], axis=1),
                jnp.concatenate([gw[1], uw[1]])))(
                    _lin(hf, pre + "mlp_block.gate_proj"),
                    _lin(hf, pre + "mlp_block.up_proj")),
                "gate_up_proj", act_scales, i),
            "down_proj": _q(cfg, *_lin(hf, pre + "mlp_block.down_proj"),
                            "down_proj", act_scales, i),
        })
        t = RG_PATTERN[i % p_len]
        tb = pre + "temporal_block."
        if t == "attention":
            qw, qb = _lin(hf, tb + "q_proj")
            kw, kb = _lin(hf, tb + "k_proj")
            vw, vb = _lin(hf, tb + "v_proj")
            qkv_w = jnp.concatenate([qw, kw, vw], axis=1)
            qkv_b = None
            if qb is not None:
                qkv_b = jnp.concatenate([qb, kb, vb])
            att.append({
                "qkv_proj": _q(cfg, qkv_w, qkv_b, "qkv_proj",
                               act_scales, i),
                "o_proj": _q(cfg, *_lin(hf, tb + "o_proj"), "o_proj",
                             act_scales, i),
            })
        else:
            lru = cfg.hidden_size
            rec.append({
                "linear_y": _q(cfg, *_lin(hf, tb + "linear_y"),
                               "gate_up_proj", act_scales, i),
                "linear_x": _q(cfg, *_lin(hf, tb + "linear_x"),
                               "gate_up_proj", act_scales, i),
                "linear_out": _q(cfg, *_lin(hf, tb + "linear_out"),
                                 "o_proj", act_scales, i),
                # HF conv1d weight (lru, 1, K): tap K-1 = current token
                "conv_w": jnp.moveaxis(
                    _arr(hf[tb + "conv_1d.weight"])[:, 0, :], 1, 0)
                .astype(jnp.float32),
                "conv_b": _arr(hf[tb + "conv_1d.bias"]).astype(jnp.float32),
                "recurrent_param": _arr(hf[tb + "rg_lru.recurrent_param"])
                .astype(jnp.float32),
                "input_gate_w": _arr(hf[tb + "rg_lru.input_gate_weight"])
                .astype(jnp.float32),
                "input_gate_b": _arr(hf[tb + "rg_lru.input_gate_bias"])
                .astype(jnp.float32),
                "recurrent_gate_w": _arr(
                    hf[tb + "rg_lru.recurrent_gate_weight"])
                .astype(jnp.float32),
                "recurrent_gate_b": _arr(
                    hf[tb + "rg_lru.recurrent_gate_bias"])
                .astype(jnp.float32),
            })

    def regroup(stacked, n):
        return jax.tree_util.tree_map(
            lambda a: a.reshape((g, n) + a.shape[1:]), stacked)

    r, a = _counts()
    return {
        "embed": {"w": _arr(hf["model.embed_tokens.weight"])
                  .astype(cfg.dtype)},
        "per_pos": regroup(_stack(per_pos), p_len),
        "att": regroup(_stack(att), a),
        "rec": regroup(_stack(rec), r),
        "final_norm": {"w": _arr(hf["model.final_norm.weight"])
                       .astype(jnp.float32) + 1.0},
    }


def init_random_params(cfg: ModelConfig, key: jax.Array,
                       act_scales=None) -> Dict:
    p_len = len(RG_PATTERN)
    g = cfg.num_layers // p_len
    std = 0.02
    h, inter, lru = cfg.hidden_size, cfg.intermediate_size, cfg.hidden_size
    nh = cfg.num_heads
    bw = lru // nh
    keys = iter(jax.random.split(key, cfg.num_layers * 12 + 2))

    def rnd(*shape):
        return jax.random.normal(next(keys), shape, jnp.float32) * std

    per_pos, att, rec = [], [], []
    for i in range(cfg.num_layers):
        per_pos.append({
            "temporal_norm": {"w": jnp.ones((h,), jnp.float32)},
            "channel_norm": {"w": jnp.ones((h,), jnp.float32)},
            "gate_up_proj": _q(cfg, rnd(h, 2 * inter),
                               jnp.zeros((2 * inter,)), "gate_up_proj",
                               act_scales, i),
            "down_proj": _q(cfg, rnd(inter, h), jnp.zeros((h,)),
                            "down_proj", act_scales, i),
        })
        if RG_PATTERN[i % p_len] == "attention":
            att.append({
                "qkv_proj": _q(cfg, rnd(h, cfg.qkv_out),
                               jnp.zeros((cfg.qkv_out,))
                               if cfg.qkv_bias else None,
                               "qkv_proj", act_scales, i),
                "o_proj": _q(cfg, rnd(cfg.q_size, h), jnp.zeros((h,)),
                             "o_proj", act_scales, i),
            })
        else:
            rec.append({
                "linear_y": _q(cfg, rnd(h, lru), jnp.zeros((lru,)),
                               "gate_up_proj", act_scales, i),
                "linear_x": _q(cfg, rnd(h, lru), jnp.zeros((lru,)),
                               "gate_up_proj", act_scales, i),
                "linear_out": _q(cfg, rnd(lru, h), jnp.zeros((h,)),
                                 "o_proj", act_scales, i),
                "conv_w": rnd(cfg.conv_kernel, lru),
                "conv_b": jnp.zeros((lru,), jnp.float32),
                "recurrent_param": jnp.ones((lru,), jnp.float32),
                "input_gate_w": rnd(nh, bw, bw),
                "input_gate_b": jnp.zeros((nh, bw), jnp.float32),
                "recurrent_gate_w": rnd(nh, bw, bw),
                "recurrent_gate_b": jnp.zeros((nh, bw), jnp.float32),
            })

    def regroup(stacked, n):
        return jax.tree_util.tree_map(
            lambda a: a.reshape((g, n) + a.shape[1:]), stacked)

    r, a = _counts()
    return {
        "embed": {"w": rnd(cfg.vocab_size, h).astype(cfg.dtype)},
        "per_pos": regroup(_stack(per_pos), p_len),
        "att": regroup(_stack(att), a),
        "rec": regroup(_stack(rec), r),
        "final_norm": {"w": jnp.ones((h,), jnp.float32)},
    }
