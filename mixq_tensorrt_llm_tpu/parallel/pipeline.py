"""Pipeline parallelism: GPipe-style microbatch schedule over the 'pp' axis.

Reference parity: TRT-LLM pipeline parallel (mapping.py pp_layers partition,
NCCL send/recv plugins functional.py:3921-4010, per-stage engines). TPU
re-design: one shard_map program over the 'pp' mesh axis — each stage owns
a contiguous slab of layers (stacked-params leading axis sharded on 'pp'),
activations hop stages via lax.ppermute, and the classic (M + P - 1)-tick
schedule keeps every stage busy once the pipeline fills. No per-rank
programs, no NCCL bookkeeping: the collective IS the schedule.

This module provides the scoring/prefill forward (full causal attention,
no KV cache) used by PPL evaluation and calibration at pp > 1. The decode
path stays dp/tp-sharded (decode is latency-bound; pipelining single-token
steps only adds bubbles — the reference reaches the same conclusion by
broadcasting tokens between engine stages, generation.py:2528).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.common import ModelConfig
from ..ops import ref as ops_ref
from ..ops import dispatch
from ..models import common as mcommon


def _score_layer(cfg: ModelConfig, layer_params: Dict, x, sin, cos):
    """Cache-less decoder block (full causal self-attention) for scoring."""
    b, s, _ = x.shape
    qkv = dispatch.norm_linear(layer_params["qkv_proj"], x,
                               cfg.module_algo("qkv_proj"),
                               layer_params["input_norm"]["w"],
                               eps=cfg.rms_norm_eps)
    q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q = mcommon.apply_rope(q, sin, cos)
    k = mcommon.apply_rope(k, sin, cos)
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
    attn = ops_ref.attention(q, k, v, mask=mask, scale=cfg.head_dim ** -0.5)
    attn = attn.reshape(b, s, cfg.q_size)
    attn = dispatch.linear(layer_params["o_proj"], attn,
                           cfg.module_algo("o_proj"))
    x = x + attn.astype(x.dtype)

    gate_up = dispatch.norm_linear(layer_params["gate_up_proj"], x,
                                   cfg.module_algo("gate_up_proj"),
                                   layer_params["post_norm"]["w"],
                                   eps=cfg.rms_norm_eps)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    h = (jax.nn.silu(gate.astype(jnp.float32)) *
         up.astype(jnp.float32)).astype(x.dtype)
    h = dispatch.linear(layer_params["down_proj"], h,
                        cfg.module_algo("down_proj"))
    return x + h.astype(x.dtype)


def pipeline_score_logits(params: Dict, cfg: ModelConfig, mesh: Mesh,
                          tokens: jax.Array, num_microbatches: int):
    """Teacher-forced logits with layers pipelined over the 'pp' mesh axis.

    tokens: (B, S) with B divisible by num_microbatches. Layer params must
    be sharded P('pp', ...) on their stacked axis; embed/norm/lm_head
    replicated. Returns logits (B, S, vocab) replicated.
    """
    pp = mesh.shape["pp"]
    assert cfg.num_layers % pp == 0
    m = num_microbatches
    b, s = tokens.shape
    assert b % m == 0, (b, m)
    mb = b // m

    tokens_mb = tokens.reshape(m, mb, s)
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (mb, 1))
    sin, cos = mcommon.rope_sin_cos(pos, cfg.head_dim, cfg.rope_theta)

    layer_params = params["layers"]
    other = {k: v for k, v in params.items() if k != "layers"}

    layer_specs = jax.tree.map(lambda _: P("pp"), layer_params)
    other_specs = jax.tree.map(lambda _: P(), other)

    def run(layer_params_local, other_params, tokens_mb):
        """Runs on one pp rank; layer_params_local: (L/pp, ...) slab."""
        rank = jax.lax.axis_index("pp")

        def stage(h):
            def body(h, one_layer):
                return _score_layer(cfg, one_layer, h, sin, cos), None
            h, _ = jax.lax.scan(body, h, layer_params_local)
            return h

        def head(h):
            h = ops_ref.rmsnorm(h, other_params["final_norm"]["w"],
                                cfg.rms_norm_eps)
            if "lm_head" in other_params:
                logits = dispatch.linear(other_params["lm_head"], h,
                                         cfg.module_algo("lm_head"))
            else:
                logits = jnp.dot(h.astype(jnp.bfloat16),
                                 other_params["embed"]["w"].T.astype(
                                     jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            return logits.astype(jnp.float32)

        def tick(t, carry):
            h_in, out = carry
            mb_idx = t - rank
            valid = (mb_idx >= 0) & (mb_idx < m)
            safe_idx = jnp.clip(mb_idx, 0, m - 1)
            # stage 0 injects a fresh microbatch; others take the hop input
            fresh = jnp.take(params_embed, tokens_mb[safe_idx],
                             axis=0).astype(cfg.dtype)
            h = jnp.where(rank == 0, fresh, h_in)
            h = jnp.where(valid, stage(h), h)
            # last stage emits logits for its just-finished microbatch
            emit = valid & (rank == pp - 1)
            logits = head(h)
            out = jnp.where(emit, out.at[safe_idx].set(logits), out)
            # hop to the next stage (ring; stage P-1 -> 0 is ignored)
            h_next = jax.lax.ppermute(
                h, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return h_next, out

        params_embed = other_params["embed"]["w"]
        # pvary: the loop carry becomes device-varying after the first
        # ppermute/rank-dependent update, so seed it as varying
        h0 = jax.lax.pvary(jnp.zeros((mb, s, cfg.hidden_size), cfg.dtype),
                           "pp")
        out0 = jax.lax.pvary(
            jnp.zeros((m, mb, s, cfg.vocab_size), jnp.float32), "pp")
        _, out = jax.lax.fori_loop(0, m + pp - 1, tick, (h0, out0))
        # only the last stage holds real logits; psum replicates them
        out = jnp.where(rank == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pp")

    shmapped = shard_map(
        run, mesh=mesh,
        in_specs=(layer_specs, other_specs, P()),
        out_specs=P())
    out = shmapped(layer_params, other, tokens_mb)
    return out.reshape(b, s, cfg.vocab_size)
