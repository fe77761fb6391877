"""Mamba (selective state-space) family.

Reference parity: tensorrt_llm/models/mamba/ (model.py MambaForCausalLM —
the reference zoo's non-attention family; its runtime carries per-layer
conv/ssm state slots instead of a paged KV cache). TPU re-design:

  * The recurrence h_t = exp(dt_t*A) h_{t-1} + dt_t*B_t*x_t is a batched
    ELEMENTWISE linear recurrence over (d_inner, d_state) lanes — prefill
    runs it as a log-depth `jax.lax.associative_scan` over the sequence
    (XLA maps the combine to fused VPU ops; no sequential S-step loop),
    decode (S == 1) is a single fused state update.
  * The depthwise causal conv (kernel K = 4) is K shifted multiply-adds
    over a (K-1)-token carry — no im2col, no gather.
  * State rides the existing KVCache pytree (conv carry in `k`, SSM state
    in `v`), so GenerationSession / LLM / bench drive Mamba unchanged; no
    paging is needed (state is O(1) in sequence length — the whole point).

Quantization: in_proj/out_proj follow the mix routing of gate_up/o
projections (they are the FLOP carriers); x_proj/dt_proj are tiny
(dt_rank + 2*d_state columns) and stay float, mirroring the reference's
choice to keep non-GEMM-bulk layers fp16 (SURVEY §2.4: only qkv/gate/proj
get mixed treatment).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dispatch
from ..quant.config import QuantConfig
from .common import KVCache, ModelConfig


def config_from_hf(hf_config, quant: QuantConfig = QuantConfig()
                   ) -> ModelConfig:
    """HF MambaConfig -> ModelConfig (mamba-1, state-spaces/*-hf)."""
    g = lambda name, d=None: getattr(hf_config, name, d)
    d_inner = g("intermediate_size") or int(g("expand", 2)
                                            * hf_config.hidden_size)
    return ModelConfig(
        arch="mamba", vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=d_inner,                      # d_inner
        num_layers=hf_config.num_hidden_layers,
        num_heads=1, num_kv_heads=1, head_dim=1,        # no attention
        max_position_embeddings=g("max_position_embeddings", 1 << 20),
        pos_embedding="none",
        ssm_state_size=g("state_size", 16),
        conv_kernel=g("conv_kernel", 4),
        dt_rank=(g("time_step_rank") if isinstance(g("time_step_rank"), int)
                 else -(-hf_config.hidden_size // 16)),
        use_conv_bias=bool(g("use_conv_bias", True)),
        mlp_bias=bool(g("use_bias", False)),            # in/out_proj bias
        rms_norm_eps=g("layer_norm_epsilon", 1e-5),
        tie_word_embeddings=bool(g("tie_word_embeddings", True)),
        quant=quant)


def init_state(cfg: ModelConfig, batch: int) -> KVCache:
    """Per-layer recurrent state in the KVCache container:
    k = conv carry (L, B, K-1, I) model dtype; v = SSM state
    (L, B, I, N) float32 (the recurrence accumulates in f32)."""
    return KVCache(
        k=jnp.zeros((cfg.num_layers, batch, cfg.conv_kernel - 1,
                     cfg.intermediate_size), cfg.dtype),
        v=jnp.zeros((cfg.num_layers, batch, cfg.intermediate_size,
                     cfg.ssm_state_size), jnp.float32))


def _scan_combine(e1, e2):
    """Associative combine for h_t = a_t * h_{t-1} + b_t."""
    a1, b1 = e1
    a2, b2 = e2
    return a1 * a2, a2 * b1 + b2


def mamba_mixer(cfg: ModelConfig, lp: Dict, x: jax.Array,
                conv_state: jax.Array, ssm_state: jax.Array,
                mask: jax.Array, local_valid: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One MambaMixer (HF MambaMixer.slow_forward semantics).

    x (B, S, H) normalized block input; conv_state (B, K-1, I);
    ssm_state (B, I, N) f32; mask (B, S) marks valid (non-pad) tokens;
    local_valid (B,) = number of valid tokens in THIS call. Invalid
    positions leave both states untouched (dt = 0 -> a = 1, b = 0).
    Returns (out (B, S, H), new conv_state, new ssm_state).
    """
    b, s, _ = x.shape
    i = cfg.intermediate_size
    n = cfg.ssm_state_size
    k = cfg.conv_kernel

    algo_in = cfg.module_algo("gate_up_proj")
    algo_out = cfg.module_algo("o_proj")
    xz = dispatch.linear(lp["in_proj"], x, algo_in)         # (B, S, 2I)
    x_in, z = jnp.split(xz, 2, axis=-1)
    x_in = jnp.where(mask[..., None], x_in, 0.0).astype(cfg.dtype)

    # depthwise causal conv over [carry | tokens]: K shifted MACs
    xc = jnp.concatenate([conv_state.astype(cfg.dtype), x_in], axis=1)
    conv_w = lp["conv_w"].astype(jnp.float32)               # (K, I)
    xcf = xc.astype(jnp.float32)
    h = sum(xcf[:, j:j + s, :] * conv_w[j] for j in range(k))
    if "conv_b" in lp:
        h = h + lp["conv_b"].astype(jnp.float32)
    x_conv = jax.nn.silu(h)                                 # (B, S, I) f32
    # new carry: the K-1 inputs ending at the last VALID token (indices
    # local_valid .. local_valid+K-2 of xc; pads are zeroed above)
    idx = local_valid[:, None] + jnp.arange(k - 1)[None, :]
    new_conv = jnp.take_along_axis(xc, idx[..., None], axis=1)

    # ssm parameters (float path — dt_rank + 2N columns are tiny)
    dbc = jnp.dot(x_conv.astype(cfg.dtype),
                  lp["x_proj"]["w"].astype(cfg.dtype),
                  preferred_element_type=jnp.float32)
    dt, bmat, cmat = jnp.split(dbc, [cfg.dt_rank, cfg.dt_rank + n], axis=-1)
    dt = jnp.dot(dt, lp["dt_proj"]["w"].astype(jnp.float32)) \
        + lp["dt_proj"]["b"].astype(jnp.float32)
    dt = jax.nn.softplus(dt)                                # (B, S, I)
    dt = jnp.where(mask[..., None], dt, 0.0)                # pads: identity

    a_mat = -jnp.exp(lp["A_log"].astype(jnp.float32))       # (I, N)
    da = jnp.exp(dt[..., None] * a_mat)                     # (B, S, I, N)
    db = dt[..., None] * bmat[:, :, None, :] \
        * x_conv[..., None].astype(jnp.float32)             # (B, S, I, N)

    if s == 1:   # decode: one fused state update, no scan machinery
        hstate = da[:, 0] * ssm_state + db[:, 0]            # (B, I, N)
        hs = hstate[:, None]
    else:
        # h_t = A_t * h_0 + B_t with (A_t, B_t) the prefix products of
        # (da_t, db_t) under the affine combine — log-depth over S
        pa, pb = jax.lax.associative_scan(_scan_combine, (da, db), axis=1)
        hs = pa * ssm_state[:, None] + pb                   # (B, S, I, N)
        hstate = hs[:, -1]

    y = jnp.einsum("bsin,bsn->bsi", hs, cmat) \
        + lp["D"].astype(jnp.float32) * x_conv
    y = y * jax.nn.silu(z.astype(jnp.float32))
    out = dispatch.linear(lp["out_proj"], y.astype(cfg.dtype), algo_out)
    return out, new_conv.astype(cfg.dtype), hstate


def forward(params: Dict, cfg: ModelConfig, tokens: jax.Array,
            write_pos: jax.Array, cache: KVCache, valid_len: jax.Array,
            **_unused) -> Tuple[jax.Array, KVCache]:
    """Full Mamba forward with the common.forward signature.

    write_pos (B, S): absolute positions (only [:, 0] is consumed — the
    count of tokens already absorbed into the state); valid_len (B,):
    total valid tokens after this call. Extra keyword options of the
    attention forward (full_prefill, lora_ids, ...) are accepted and
    ignored — Mamba has no flash/paged variants to select.
    """
    from . import common as mcommon
    b, s = tokens.shape
    x = mcommon._embed(params, cfg, tokens, write_pos)
    local_valid = (valid_len - write_pos[:, 0]).astype(jnp.int32)
    mask = jnp.arange(s)[None, :] < local_valid[:, None]

    def body(x, scanned):
        lp, conv_st, ssm_st = scanned
        h = mcommon.block_norm(cfg, x, lp["norm"])
        out, new_conv, new_ssm = mamba_mixer(cfg, lp, h, conv_st, ssm_st,
                                             mask, local_valid)
        return x + out.astype(x.dtype), (new_conv, new_ssm)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (params["layers"], cache.k, cache.v))
    logits = mcommon._head(params, cfg, x)
    return logits.astype(jnp.float32), KVCache(k=new_k, v=new_v)


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

def _quantize_mixer(cfg: ModelConfig, fl: Dict, act_scales, i: int) -> Dict:
    from .llama import act_scale_for
    out = {k: v for k, v in fl.items()
           if k not in ("in_proj", "out_proj")}
    for mod, route in (("in_proj", "gate_up_proj"), ("out_proj", "o_proj")):
        w, bias = fl[mod]
        algo = cfg.module_algo(route)
        scale = act_scale_for(act_scales, i, route, w.shape[0]) \
            if algo.is_mix else None
        out[mod] = dispatch.quantize_linear_params(
            jnp.asarray(w, jnp.float32), algo, act_scale=scale,
            num_outliers=cfg.quant.num_outliers,
            group_size=cfg.quant.group_size,
            bias=jnp.asarray(bias, jnp.float32) if bias is not None else None)
    return out


def _arr(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x))


def params_from_hf(cfg: ModelConfig, hf: Mapping[str, np.ndarray],
                   act_scales=None) -> Dict:
    """HF MambaForCausalLM state dict -> params pytree."""
    from .llama import stack_layers
    layers = []
    for i in range(cfg.num_layers):
        p = f"backbone.layers.{i}.mixer."
        fl = {
            "norm": {"w": _arr(hf[f"backbone.layers.{i}.norm.weight"]
                               ).astype(jnp.float32)},
            "in_proj": (_arr(hf[p + "in_proj.weight"]).T,
                        _arr(hf[p + "in_proj.bias"])
                        if p + "in_proj.bias" in hf else None),
            "out_proj": (_arr(hf[p + "out_proj.weight"]).T,
                         _arr(hf[p + "out_proj.bias"])
                         if p + "out_proj.bias" in hf else None),
            # HF conv1d weight (I, 1, K): tap K-1 multiplies the current
            # token -> our (K, I) shifted-MAC layout
            "conv_w": jnp.moveaxis(_arr(hf[p + "conv1d.weight"])[:, 0, :],
                                   1, 0).astype(jnp.float32),
            "x_proj": {"w": _arr(hf[p + "x_proj.weight"]).T
                       .astype(jnp.bfloat16)},
            "dt_proj": {"w": _arr(hf[p + "dt_proj.weight"]).T
                        .astype(jnp.float32),
                        "b": _arr(hf[p + "dt_proj.bias"])
                        .astype(jnp.float32)},
            "A_log": _arr(hf[p + "A_log"]).astype(jnp.float32),
            "D": _arr(hf[p + "D"]).astype(jnp.float32),
        }
        if p + "conv1d.bias" in hf:
            fl["conv_b"] = _arr(hf[p + "conv1d.bias"]).astype(jnp.float32)
        layers.append(_quantize_mixer(cfg, fl, act_scales, i))
    params: Dict = {
        "embed": {"w": _arr(hf["backbone.embeddings.weight"])
                  .astype(cfg.dtype)},
        "layers": stack_layers(layers),
        "final_norm": {"w": _arr(hf["backbone.norm_f.weight"])
                       .astype(jnp.float32)},
    }
    if "lm_head.weight" in hf and not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": _arr(hf["lm_head.weight"]).T
                             .astype(cfg.dtype)}
    return params


def init_random_params(cfg: ModelConfig, key: jax.Array,
                       act_scales=None) -> Dict:
    from .llama import stack_layers
    keys = jax.random.split(key, cfg.num_layers + 2)
    std = 0.02
    i, n = cfg.intermediate_size, cfg.ssm_state_size

    def rnd(k, *shape):
        return jax.random.normal(k, shape, jnp.float32) * std

    layers = []
    for li in range(cfg.num_layers):
        lk = jax.random.split(keys[li], 6)
        fl = {
            "norm": {"w": jnp.ones((cfg.hidden_size,), jnp.float32)},
            "in_proj": (rnd(lk[0], cfg.hidden_size, 2 * i), None),
            "out_proj": (rnd(lk[1], i, cfg.hidden_size), None),
            "conv_w": rnd(lk[2], cfg.conv_kernel, i),
            "conv_b": jnp.zeros((i,), jnp.float32),
            "x_proj": {"w": rnd(lk[3], i, cfg.dt_rank + 2 * n)
                       .astype(jnp.bfloat16)},
            "dt_proj": {"w": rnd(lk[4], cfg.dt_rank, i),
                        "b": jnp.full((i,), -4.0, jnp.float32)},
            "A_log": jnp.log(1.0 + jnp.arange(n, dtype=jnp.float32)
                             )[None, :].repeat(i, 0),
            "D": jnp.ones((i,), jnp.float32),
        }
        layers.append(_quantize_mixer(cfg, fl, act_scales, li))
    params: Dict = {
        "embed": {"w": rnd(keys[-2], cfg.vocab_size, cfg.hidden_size)
                  .astype(cfg.dtype)},
        "layers": stack_layers(layers),
        "final_norm": {"w": jnp.ones((cfg.hidden_size,), jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": rnd(keys[-1], cfg.hidden_size,
                                      cfg.vocab_size).astype(cfg.dtype)}
    return params
