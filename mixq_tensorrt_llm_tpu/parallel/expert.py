"""Expert parallelism with RAGGED local dispatch over the 'ep' mesh axis.

The GSPMD dense-MoE path (models/moe._moe_mlp_dense with the expert axis
sharded) is correct but every shard still runs ALL of its local experts
over ALL tokens — E_local/k of the FLOPs are wasted (4x for Mixtral
top-2/8 on one chip, and the waste persists per shard). The reference
nests moe_ep inside TP and dispatches densely too (mapping.py:102-103,
layers/moe.py); this module exceeds it: a shard_map over 'ep' where each
shard routes globally (replicated router), keeps only the token-expert
pairs owned by its local expert slice, runs `jax.lax.ragged_dot` over the
contiguous local groups, and psums the combine. Pairs owned elsewhere
fall into a trailing overflow group that ragged_dot never touches
(group_sizes covers only real rows) and combine with weight 0.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_ragged_moe(cfg, router_w, gate_up, down, x, axis: str):
    """Per-shard body. x (B, S, H) replicated; gate_up/down stacks hold
    the LOCAL expert slice (E/ep, ...). Returns the psum'd (B, S, H)."""
    from ..models.moe import _dequant_stack
    b, s, h = x.shape
    t = b * s
    e, k = cfg.num_experts, cfg.top_k_experts
    ep = jax.lax.psum(1, axis)
    eloc = e // ep
    idx = jax.lax.axis_index(axis)
    xf = x.reshape(t, h)

    logits = jnp.dot(xf.astype(jnp.float32),
                     router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, top_ids = jax.lax.top_k(probs, k)                 # (T, k)
    if cfg.moe_norm_topk:
        top_vals = top_vals / jnp.maximum(top_vals.sum(-1, keepdims=True),
                                          1e-9)

    eid = top_ids.reshape(-1)                                   # (T*k,)
    is_local = (eid >= idx * eloc) & (eid < (idx + 1) * eloc)
    # non-local pairs sort into the trailing overflow group, which
    # group_sizes (length eloc) never reaches
    local_eid = jnp.where(is_local, eid - idx * eloc, eloc)
    order = jnp.argsort(local_eid)                              # stable
    tok_idx = order // k
    xs = jnp.take(xf, tok_idx, axis=0).astype(jnp.bfloat16)
    group_sizes = jnp.bincount(jnp.where(is_local, local_eid, eloc)[order],
                               length=eloc).astype(jnp.int32)

    gu = jax.lax.ragged_dot(xs, _dequant_stack(gate_up), group_sizes,
                            preferred_element_type=jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)
    dn = jax.lax.ragged_dot(act, _dequant_stack(down), group_sizes,
                            preferred_element_type=jnp.float32)

    w = jnp.take(top_vals.reshape(-1), order)
    w = jnp.where(jnp.take(is_local, order), w, 0.0)            # (T*k,)
    out = jnp.zeros((t, h), jnp.float32).at[tok_idx].add(dn * w[:, None])
    out = jax.lax.psum(out, axis)
    return out.reshape(b, s, h).astype(x.dtype)


def moe_mlp_ep(cfg, moe_params: Dict, x: jax.Array, mesh: Mesh,
               axis: str = "ep") -> jax.Array:
    """Expert-parallel ragged MoE: expert stacks sharded over `axis`,
    activations replicated, one psum combine. Quantized expert stacks
    (qweight/scale_col) shard with their leading expert dim."""
    def espec(p):
        return jax.tree_util.tree_map(lambda _: P(axis), p)

    body = lambda rw, gu, dn, xl: _local_ragged_moe(
        cfg, rw, gu, dn, xl, axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), espec(moe_params["gate_up"]),
                  espec(moe_params["down"]), P()),
        out_specs=P())(moe_params["router"]["w"],
                       moe_params["gate_up"], moe_params["down"], x)


_ACTIVE_EP: list = [None]   # (mesh, axis) or None


def active_ep() -> Optional[tuple]:
    return _ACTIVE_EP[0]


class use_expert_parallel:
    """Trace-time switch: inside this context, models/moe.moe_mlp routes
    through the ragged EP dispatch over `mesh`'s `axis`."""

    def __init__(self, mesh: Mesh, axis: str = "ep"):
        self.mesh, self.axis = mesh, axis

    def __enter__(self):
        _ACTIVE_EP[0] = (self.mesh, self.axis)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_EP[0] = None
        return False
