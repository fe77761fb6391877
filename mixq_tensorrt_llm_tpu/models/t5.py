"""T5 encoder-decoder family (the reference zoo's enc_dec branch).

Reference parity: tensorrt_llm/models/enc_dec/ (T5/BART encoder-decoder
with cross attention and relative position bias). TPU re-design:

  * The encoder is one bidirectional forward (no cache); its output feeds
    per-layer CROSS-attention K/V computed once and reused for the whole
    decode — the reference does the same with its cross_kv engine run.
  * Decoder self-attention carries the usual dense KVCache; the T5
    relative position bias is computed in-graph from the bucket formula
    (log-spaced long-range buckets) with the layer-0 bias table shared
    across layers, exactly HF's wiring.
  * T5 attention is UNSCALED (no 1/sqrt(d)); T5LayerNorm is plain RMSNorm
    (no mean subtraction, no +1); tied LM heads scale logits by
    d_model**-0.5.

Quantization: q/k/v fused per self-attention block and k/v fused per
cross block; routes follow the standard mix mapping (qkv/o mix, wi mix,
wo weight-only), the tiny relative-bias table stays float.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dispatch
from ..ops import ref as ops_ref
from ..quant.config import QuantConfig


@dataclasses.dataclass(frozen=True)
class T5Config:
    """Static T5 architecture description (hashable)."""
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6            # encoder layers
    num_decoder_layers: int = 6
    num_heads: int = 8
    rel_buckets: int = 32
    rel_max_distance: int = 128
    gated_act: bool = False        # t5 v1.1 gated-gelu
    hidden_act: str = "relu"
    rms_norm_eps: float = 1e-6
    pad_token_id: int = 0
    decoder_start_token_id: int = 0
    eos_token_id: int = 1
    tie_word_embeddings: bool = True
    quant: QuantConfig = QuantConfig()

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()
                   ) -> T5Config:
    g = lambda n, d=None: getattr(hf_config, n, d)
    act = g("feed_forward_proj", "relu")
    gated = act.startswith("gated-")
    return T5Config(
        vocab_size=hf_config.vocab_size, d_model=hf_config.d_model,
        d_kv=hf_config.d_kv, d_ff=hf_config.d_ff,
        num_layers=hf_config.num_layers,
        num_decoder_layers=g("num_decoder_layers") or hf_config.num_layers,
        num_heads=hf_config.num_heads,
        rel_buckets=g("relative_attention_num_buckets", 32),
        rel_max_distance=g("relative_attention_max_distance", 128),
        gated_act=gated,
        hidden_act=("gelu_new" if "gelu" in act else "relu"),
        rms_norm_eps=g("layer_norm_epsilon", 1e-6),
        pad_token_id=g("pad_token_id", 0) or 0,
        decoder_start_token_id=g("decoder_start_token_id", 0) or 0,
        eos_token_id=g("eos_token_id", 1),
        tie_word_embeddings=bool(g("tie_word_embeddings", True)),
        quant=quant)


# ---------------------------------------------------------------------------
# relative position bias (HF T5Attention._relative_position_bucket)
# ---------------------------------------------------------------------------

def _rel_bucket(rel_pos: jax.Array, bidirectional: bool, num_buckets: int,
                max_distance: int) -> jax.Array:
    buckets = 0
    if bidirectional:
        num_buckets //= 2
        buckets = (rel_pos > 0).astype(jnp.int32) * num_buckets
        rel_pos = jnp.abs(rel_pos)
    else:
        rel_pos = -jnp.minimum(rel_pos, 0)
    max_exact = num_buckets // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel_pos, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return buckets + jnp.where(rel_pos < max_exact, rel_pos, large)


def _position_bias(table: jax.Array, q_pos: jax.Array, k_pos: jax.Array,
                   bidirectional: bool, num_buckets: int,
                   max_distance: int) -> jax.Array:
    """table (num_buckets, H); q_pos (Sq,), k_pos (Sk,)
    -> (1, H, Sq, Sk) additive logits bias."""
    rel = k_pos[None, :] - q_pos[:, None]
    b = _rel_bucket(rel, bidirectional, num_buckets, max_distance)
    vals = table[b]                                    # (Sq, Sk, H)
    return jnp.moveaxis(vals, -1, 0)[None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    return ops_ref.rmsnorm(x, w, eps)


def _attn(cfg: T5Config, q, k, v, mask, bias) -> jax.Array:
    return ops_ref.attention(q, k, v, mask=mask, scale=1.0, bias=bias)


def _self_attention(cfg: T5Config, lp: Dict, x: jax.Array, mask, bias):
    b, s, _ = x.shape
    h, d = cfg.num_heads, cfg.d_kv
    qkv = dispatch.linear(lp["qkv"], x, cfg.quant.module_algo("qkv_proj"))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, h, d)
    k = k.reshape(b, s, h, d)
    v = v.reshape(b, s, h, d)
    out = _attn(cfg, q, k, v, mask, bias).reshape(b, s, cfg.inner_dim)
    return dispatch.linear(lp["o"], out, cfg.quant.module_algo("o_proj")), \
        k, v


def _ff(cfg: T5Config, lp: Dict, x: jax.Array) -> jax.Array:
    from .common import _act
    algo = cfg.quant.module_algo("gate_up_proj")
    if cfg.gated_act:
        wi = dispatch.linear(lp["wi"], x, algo)
        g, u = jnp.split(wi, 2, axis=-1)
        hidden = (_act(cfg.hidden_act, g)
                  * u.astype(jnp.float32)).astype(x.dtype)
    else:
        hidden = _act(cfg.hidden_act,
                      dispatch.linear(lp["wi"], x, algo)).astype(x.dtype)
    return dispatch.linear(lp["wo"], hidden,
                           cfg.quant.module_algo("down_proj"))


def encode(params: Dict, cfg: T5Config, tokens: jax.Array,
           lens: jax.Array) -> jax.Array:
    """Bidirectional encoder: tokens (B, S) -> hidden (B, S, d_model)."""
    b, s = tokens.shape
    x = jnp.take(params["embed"]["w"], tokens, axis=0)
    valid = jnp.arange(s)[None, :] < lens[:, None]
    mask = valid[:, None, None, :]                      # (B,1,1,S)
    pos = jnp.arange(s, dtype=jnp.int32)
    bias = _position_bias(params["enc_rel_bias"]["w"], pos, pos, True,
                          cfg.rel_buckets, cfg.rel_max_distance)

    def body(x, lp):
        a, _, _ = _self_attention(
            cfg, lp["attn"],
            _norm(x, lp["attn_norm"]["w"], cfg.rms_norm_eps), mask, bias)
        x = x + a.astype(x.dtype)
        f = _ff(cfg, lp["ff"], _norm(x, lp["ff_norm"]["w"],
                                     cfg.rms_norm_eps))
        return x + f.astype(x.dtype), None

    x, _ = jax.lax.scan(body, x, params["enc_layers"])
    return _norm(x, params["enc_final_norm"]["w"], cfg.rms_norm_eps)


def cross_kv(params: Dict, cfg: T5Config, enc_hidden: jax.Array
             ) -> Tuple[jax.Array, jax.Array]:
    """Per-decoder-layer cross K/V from the encoder output, computed ONCE
    (reference enc_dec cross_kv run): -> (L, B, Senc, H, D) x 2."""
    b, s, _ = enc_hidden.shape
    h, d = cfg.num_heads, cfg.d_kv

    def body(_, lp):
        kv = dispatch.linear(lp["cross"]["kv"], enc_hidden,
                             cfg.quant.module_algo("qkv_proj"))
        k, v = jnp.split(kv, 2, axis=-1)
        return None, (k.reshape(b, s, h, d), v.reshape(b, s, h, d))

    _, (ks, vs) = jax.lax.scan(body, None, params["dec_layers"])
    return ks, vs


def decode(params: Dict, cfg: T5Config, dec_tokens: jax.Array,
           positions: jax.Array, self_k, self_v, kv_valid: jax.Array,
           enc_k, enc_v, enc_lens: jax.Array):
    """Decoder forward writing self-attn KV at `positions`.

    dec_tokens (B, S); positions (S,) absolute; self_k/v (L, B, Smax, H,
    D) caches; kv_valid scalar-ish (B,) valid AFTER this call; enc_k/v
    (L, B, Senc, H, D). Returns (logits (B,S,V), self_k, self_v)."""
    b, s = dec_tokens.shape
    x = jnp.take(params["embed"]["w"], dec_tokens, axis=0)
    smax = self_k.shape[2]
    kv_pos = jnp.arange(smax, dtype=jnp.int32)
    self_mask = (kv_pos[None, None, None, :] <= positions[None, None, :, None]) \
        & (kv_pos[None, None, None, :] < kv_valid[:, None, None, None])
    bias = _position_bias(params["dec_rel_bias"]["w"], positions, kv_pos,
                          False, cfg.rel_buckets, cfg.rel_max_distance)
    senc = enc_k.shape[2]
    cross_mask = (jnp.arange(senc)[None, :]
                  < enc_lens[:, None])[:, None, None, :]
    h, d = cfg.num_heads, cfg.d_kv

    def body(x, scanned):
        lp, ck_full, cv_full, xk, xv = scanned
        xn = _norm(x, lp["attn_norm"]["w"], cfg.rms_norm_eps)
        qkv = dispatch.linear(lp["attn"]["qkv"], xn,
                              cfg.quant.module_algo("qkv_proj"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, h, d)
        ck_full = jax.lax.dynamic_update_slice_in_dim(
            ck_full, k.reshape(b, s, h, d).astype(ck_full.dtype),
            positions[0], axis=1)
        cv_full = jax.lax.dynamic_update_slice_in_dim(
            cv_full, v.reshape(b, s, h, d).astype(cv_full.dtype),
            positions[0], axis=1)
        a = _attn(cfg, q, ck_full, cv_full, self_mask, bias)
        a = dispatch.linear(lp["attn"]["o"], a.reshape(b, s, cfg.inner_dim),
                            cfg.quant.module_algo("o_proj"))
        x = x + a.astype(x.dtype)

        xn = _norm(x, lp["cross_norm"]["w"], cfg.rms_norm_eps)
        cq = dispatch.linear(lp["cross"]["q"], xn,
                             cfg.quant.module_algo("qkv_proj"))
        ca = _attn(cfg, cq.reshape(b, s, h, d), xk, xv, cross_mask, None)
        ca = dispatch.linear(lp["cross"]["o"],
                             ca.reshape(b, s, cfg.inner_dim),
                             cfg.quant.module_algo("o_proj"))
        x = x + ca.astype(x.dtype)

        f = _ff(cfg, lp["ff"], _norm(x, lp["ff_norm"]["w"],
                                     cfg.rms_norm_eps))
        return x + f.astype(x.dtype), (ck_full, cv_full)

    x, (self_k, self_v) = jax.lax.scan(
        body, x, (params["dec_layers"], self_k, self_v, enc_k, enc_v))
    x = _norm(x, params["dec_final_norm"]["w"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        # HF T5 scales tied-head inputs by d_model**-0.5
        x = x * (cfg.d_model ** -0.5)
        logits = jnp.dot(x, params["embed"]["w"].T,
                         preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(x, params["lm_head"]["w"],
                         preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), self_k, self_v


@functools.partial(jax.jit, static_argnames=("cfg",))
def _enc_jit(params, tokens, lens, cfg):
    return encode(params, cfg, tokens, lens)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _ckv_jit(params, enc_hidden, cfg):
    return cross_kv(params, cfg, enc_hidden)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3, 4))
def _dec_jit(params, dec_tokens, positions, self_k, self_v, kv_valid,
             enc_k, enc_v, enc_lens, cfg):
    return decode(params, cfg, dec_tokens, positions, self_k, self_v,
                  kv_valid, enc_k, enc_v, enc_lens)


def t5_generate(params: Dict, cfg: T5Config,
                input_ids: Sequence[Sequence[int]],
                max_new_tokens: int = 32) -> List[List[int]]:
    """Greedy encoder-decoder generation (reference enc_dec runner).

    Returns decoder token lists INCLUDING the decoder start token."""
    b = len(input_ids)
    senc = max(len(x) for x in input_ids)
    toks = np.full((b, senc), cfg.pad_token_id, np.int32)
    for i, t in enumerate(input_ids):
        toks[i, :len(t)] = t
    enc_lens = jnp.asarray([len(t) for t in input_ids], jnp.int32)

    # module-level jits keyed on the (hashable) cfg: repeated generate
    # calls with the same config/shapes hit the trace cache instead of
    # re-tracing fresh lambdas every call
    enc_fn = functools.partial(_enc_jit, cfg=cfg)
    ckv_fn = functools.partial(_ckv_jit, cfg=cfg)
    dec_fn = functools.partial(_dec_jit, cfg=cfg)

    enc_hidden = enc_fn(params, jnp.asarray(toks), enc_lens)
    enc_k, enc_v = ckv_fn(params, enc_hidden)


    smax = max_new_tokens + 1
    ldec, h, d = cfg.num_decoder_layers, cfg.num_heads, cfg.d_kv
    self_k = jnp.zeros((ldec, b, smax, h, d), jnp.float32)
    self_v = jnp.zeros_like(self_k)

    out = [[cfg.decoder_start_token_id] for _ in range(b)]
    cur = np.full((b, 1), cfg.decoder_start_token_id, np.int32)
    finished = np.zeros((b,), bool)
    for t in range(max_new_tokens):
        logits, self_k, self_v = dec_fn(
            params, jnp.asarray(cur), jnp.asarray([t], jnp.int32),
            self_k, self_v, jnp.full((b,), t + 1, jnp.int32),
            enc_k, enc_v, enc_lens)
        nxt = np.asarray(jnp.argmax(logits[:, 0], axis=-1))
        for i in range(b):
            if not finished[i]:
                out[i].append(int(nxt[i]))
                if nxt[i] == cfg.eos_token_id:
                    finished[i] = True
        if finished.all():
            break
        cur = nxt[:, None].astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def _arr(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x))


def _q(cfg: T5Config, w, route: str):
    algo = cfg.quant.module_algo(route)
    scale = None
    if algo.is_mix:
        # ones => arbitrary but valid outlier choice (same fallback as
        # llama.act_scale_for when no calibration artifact exists)
        scale = jnp.ones((w.shape[0],), jnp.float32)
    return dispatch.quantize_linear_params(
        jnp.asarray(w, jnp.float32), algo, act_scale=scale,
        num_outliers=cfg.quant.num_outliers,
        group_size=cfg.quant.group_size)


def _stack(dicts):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *dicts)


def params_from_hf(cfg: T5Config, hf: Mapping[str, np.ndarray],
                   act_scales=None) -> Dict:
    def lin(base):
        return _arr(hf[base + ".weight"]).T

    enc_layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}.layer."
        enc_layers.append({
            "attn": {
                "qkv": _q(cfg, jnp.concatenate(
                    [lin(p + f"0.SelfAttention.{n}") for n in "qkv"],
                    axis=1), "qkv_proj"),
                "o": _q(cfg, lin(p + "0.SelfAttention.o"), "o_proj"),
            },
            "attn_norm": {"w": _arr(hf[p + "0.layer_norm.weight"])
                          .astype(jnp.float32)},
            "ff": _ff_weights(cfg, hf, p + "1."),
            "ff_norm": {"w": _arr(hf[p + "1.layer_norm.weight"])
                        .astype(jnp.float32)},
        })
    dec_layers = []
    for i in range(cfg.num_decoder_layers):
        p = f"decoder.block.{i}.layer."
        dec_layers.append({
            "attn": {
                "qkv": _q(cfg, jnp.concatenate(
                    [lin(p + f"0.SelfAttention.{n}") for n in "qkv"],
                    axis=1), "qkv_proj"),
                "o": _q(cfg, lin(p + "0.SelfAttention.o"), "o_proj"),
            },
            "attn_norm": {"w": _arr(hf[p + "0.layer_norm.weight"])
                          .astype(jnp.float32)},
            "cross": {
                "q": _q(cfg, lin(p + "1.EncDecAttention.q"), "qkv_proj"),
                "kv": _q(cfg, jnp.concatenate(
                    [lin(p + "1.EncDecAttention.k"),
                     lin(p + "1.EncDecAttention.v")], axis=1), "qkv_proj"),
                "o": _q(cfg, lin(p + "1.EncDecAttention.o"), "o_proj"),
            },
            "cross_norm": {"w": _arr(hf[p + "1.layer_norm.weight"])
                           .astype(jnp.float32)},
            "ff": _ff_weights(cfg, hf, p + "2."),
            "ff_norm": {"w": _arr(hf[p + "2.layer_norm.weight"])
                        .astype(jnp.float32)},
        })
    params: Dict = {
        "embed": {"w": _arr(hf["shared.weight"]).astype(jnp.float32)},
        "enc_layers": _stack(enc_layers),
        "dec_layers": _stack(dec_layers),
        "enc_rel_bias": {"w": _arr(hf[
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"]).astype(jnp.float32)},
        "dec_rel_bias": {"w": _arr(hf[
            "decoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"]).astype(jnp.float32)},
        "enc_final_norm": {"w": _arr(hf["encoder.final_layer_norm.weight"])
                           .astype(jnp.float32)},
        "dec_final_norm": {"w": _arr(hf["decoder.final_layer_norm.weight"])
                           .astype(jnp.float32)},
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in hf:
        params["lm_head"] = {"w": _arr(hf["lm_head.weight"]).T
                             .astype(jnp.float32)}
    return params


def _ff_weights(cfg: T5Config, hf: Mapping, base: str) -> Dict:
    if cfg.gated_act:
        wi = jnp.concatenate(
            [_arr(hf[base + "DenseReluDense.wi_0.weight"]).T,
             _arr(hf[base + "DenseReluDense.wi_1.weight"]).T], axis=1)
    else:
        wi = _arr(hf[base + "DenseReluDense.wi.weight"]).T
    return {"wi": _q(cfg, wi, "gate_up_proj"),
            "wo": _q(cfg, _arr(hf[base + "DenseReluDense.wo.weight"]).T,
                     "down_proj")}


def init_random_params(cfg: T5Config, key: jax.Array) -> Dict:
    std = 0.02
    keys = iter(jax.random.split(
        key, (cfg.num_layers + cfg.num_decoder_layers) * 8 + 4))

    def rnd(*shape):
        return jax.random.normal(next(keys), shape, jnp.float32) * std

    def ones(n):
        return {"w": jnp.ones((n,), jnp.float32)}

    wi_out = 2 * cfg.d_ff if cfg.gated_act else cfg.d_ff
    enc, dec = [], []
    for _ in range(cfg.num_layers):
        enc.append({
            "attn": {"qkv": _q(cfg, rnd(cfg.d_model, 3 * cfg.inner_dim),
                               "qkv_proj"),
                     "o": _q(cfg, rnd(cfg.inner_dim, cfg.d_model),
                             "o_proj")},
            "attn_norm": ones(cfg.d_model),
            "ff": {"wi": _q(cfg, rnd(cfg.d_model, wi_out), "gate_up_proj"),
                   "wo": _q(cfg, rnd(cfg.d_ff, cfg.d_model), "down_proj")},
            "ff_norm": ones(cfg.d_model),
        })
    for _ in range(cfg.num_decoder_layers):
        dec.append({
            "attn": {"qkv": _q(cfg, rnd(cfg.d_model, 3 * cfg.inner_dim),
                               "qkv_proj"),
                     "o": _q(cfg, rnd(cfg.inner_dim, cfg.d_model),
                             "o_proj")},
            "attn_norm": ones(cfg.d_model),
            "cross": {"q": _q(cfg, rnd(cfg.d_model, cfg.inner_dim),
                              "qkv_proj"),
                      "kv": _q(cfg, rnd(cfg.d_model, 2 * cfg.inner_dim),
                               "qkv_proj"),
                      "o": _q(cfg, rnd(cfg.inner_dim, cfg.d_model),
                              "o_proj")},
            "cross_norm": ones(cfg.d_model),
            "ff": {"wi": _q(cfg, rnd(cfg.d_model, wi_out), "gate_up_proj"),
                   "wo": _q(cfg, rnd(cfg.d_ff, cfg.d_model), "down_proj")},
            "ff_norm": ones(cfg.d_model),
        })
    return {
        "embed": {"w": rnd(cfg.vocab_size, cfg.d_model)},
        "enc_layers": _stack(enc), "dec_layers": _stack(dec),
        "enc_rel_bias": {"w": rnd(cfg.rel_buckets, cfg.num_heads)},
        "dec_rel_bias": {"w": rnd(cfg.rel_buckets, cfg.num_heads)},
        "enc_final_norm": ones(cfg.d_model),
        "dec_final_norm": ones(cfg.d_model),
    }
