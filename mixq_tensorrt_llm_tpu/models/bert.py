"""BERT encoder family (reference tensorrt_llm/models/bert).

Encoder-only scoring: token + learned-position + token-type embeddings
with an embedding LayerNorm, POST-norm transformer blocks (LayerNorm
after each residual add — the pre-norm zoo decoder cannot express this,
hence the dedicated forward), gelu FF, tanh pooler over [CLS]. Used for
embeddings/classification, not generation; quantization routes follow
the standard mix mapping.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dispatch
from ..ops import ref as ops_ref
from ..quant.config import QuantConfig


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    quant: QuantConfig = QuantConfig()

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()
                   ) -> BertConfig:
    g = lambda n, d=None: getattr(hf_config, n, d)
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=g("type_vocab_size", 2),
        layer_norm_eps=g("layer_norm_eps", 1e-12),
        hidden_act=g("hidden_act", "gelu"),
        quant=quant)


def _ln(x, p, eps):
    return ops_ref.layernorm(x, p["w"], p.get("b"), eps)


def forward(params: Dict, cfg: BertConfig, tokens: jax.Array,
            lens: jax.Array, token_type_ids: Optional[jax.Array] = None
            ) -> Tuple[jax.Array, jax.Array]:
    """tokens (B, S), lens (B,) -> (hidden (B, S, H), pooled (B, H))."""
    from .common import _act
    b, s = tokens.shape
    x = jnp.take(params["embed"]["w"], tokens, axis=0)
    x = x + params["pos_embed"]["w"][None, :s]
    tt = token_type_ids if token_type_ids is not None \
        else jnp.zeros_like(tokens)
    x = x + jnp.take(params["type_embed"]["w"], tt, axis=0)
    x = _ln(x, params["embed_norm"], cfg.layer_norm_eps)

    valid = jnp.arange(s)[None, :] < lens[:, None]
    mask = valid[:, None, None, :]
    h, d = cfg.num_heads, cfg.head_dim
    algo_qkv = cfg.quant.module_algo("qkv_proj")
    algo_o = cfg.quant.module_algo("o_proj")
    algo_up = cfg.quant.module_algo("gate_up_proj")
    algo_down = cfg.quant.module_algo("down_proj")

    def body(x, lp):
        qkv = dispatch.linear(lp["qkv"], x, algo_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, h, d)
        k = k.reshape(b, s, h, d)
        v = v.reshape(b, s, h, d)
        a = ops_ref.attention(q, k, v, mask=mask).reshape(b, s, -1)
        a = dispatch.linear(lp["o"], a, algo_o)
        x = _ln(x + a.astype(x.dtype), lp["attn_norm"],
                cfg.layer_norm_eps)
        f = _act(cfg.hidden_act,
                 dispatch.linear(lp["up"], x, algo_up)).astype(x.dtype)
        f = dispatch.linear(lp["down"], f, algo_down)
        return _ln(x + f.astype(x.dtype), lp["ff_norm"],
                   cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = jnp.tanh(
        dispatch.linear(params["pooler"], x[:, 0],
                        cfg.quant.module_algo("lm_head")))
    return x, pooled


def _arr(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x))


def _q(cfg: BertConfig, w, b, route: str):
    algo = cfg.quant.module_algo(route)
    scale = jnp.ones((w.shape[0],), jnp.float32) if algo.is_mix else None
    return dispatch.quantize_linear_params(
        jnp.asarray(w, jnp.float32), algo, act_scale=scale,
        num_outliers=cfg.quant.num_outliers,
        group_size=cfg.quant.group_size,
        bias=jnp.asarray(b, jnp.float32) if b is not None else None)


def params_from_hf(cfg: BertConfig, hf: Mapping[str, np.ndarray],
                   act_scales=None) -> Dict:
    from .llama import stack_layers
    pre = "bert." if any(k.startswith("bert.") for k in hf) else ""

    def lin(base):
        return _arr(hf[base + ".weight"]).T, _arr(hf[base + ".bias"])

    def norm(base):
        return {"w": _arr(hf[base + ".weight"]).astype(jnp.float32),
                "b": _arr(hf[base + ".bias"]).astype(jnp.float32)}

    layers = []
    for i in range(cfg.num_layers):
        p = f"{pre}encoder.layer.{i}."
        qs = [lin(p + f"attention.self.{n}") for n in
              ("query", "key", "value")]
        layers.append({
            "qkv": _q(cfg, jnp.concatenate([w for w, _ in qs], axis=1),
                      jnp.concatenate([bb for _, bb in qs]), "qkv_proj"),
            "o": _q(cfg, *lin(p + "attention.output.dense"), "o_proj"),
            "attn_norm": norm(p + "attention.output.LayerNorm"),
            "up": _q(cfg, *lin(p + "intermediate.dense"), "gate_up_proj"),
            "down": _q(cfg, *lin(p + "output.dense"), "down_proj"),
            "ff_norm": norm(p + "output.LayerNorm"),
        })
    e = f"{pre}embeddings."
    return {
        "embed": {"w": _arr(hf[e + "word_embeddings.weight"])
                  .astype(jnp.float32)},
        "pos_embed": {"w": _arr(hf[e + "position_embeddings.weight"])
                      .astype(jnp.float32)},
        "type_embed": {"w": _arr(hf[e + "token_type_embeddings.weight"])
                       .astype(jnp.float32)},
        "embed_norm": norm(e + "LayerNorm"),
        "layers": stack_layers(layers),
        "pooler": _q(cfg, *lin(f"{pre}pooler.dense"), "lm_head"),
    }
