"""Context / sequence parallelism: ring attention over the 'sp' mesh axis.

The reference reserves CP ranks but wires no CP attention
(mapping.py:99-148 — topology only; SURVEY §2.5 calls ring attention over
ICI "a real opportunity to exceed the reference"). This module wires it:
the sequence dimension of a long prompt is sharded across 'sp'; each
device holds one Q/K/V chunk and the K/V chunks rotate around the ring
via ppermute while every device accumulates its chunk's attention with an
online softmax (flash-style running max / denominator), so the full
S x S score matrix never exists on any one device and attention memory per
device is O((S/P)^2). Collectives ride ICI; compute overlaps the permute
(XLA schedules the ppermute of the NEXT chunk against the current
partial-attention einsum).

Causality is enforced with absolute positions: chunk boundaries carry
their global offsets, so the mask is exact regardless of where a chunk is
in the ring.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_attention_local(q, k, v, q_pos, kv_pos, axis_name: str,
                          scale: float):
    """Per-device body under shard_map.

    q (B, Sl, H, D) local query chunk; k/v (B, Sl, Hkv, D) local key chunk;
    q_pos/kv_pos (B, Sl) absolute positions. Returns (B, Sl, H, D).
    """
    p = jax.lax.psum(1, axis_name)
    b, sl, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv

    qf = (q.astype(jnp.float32) * scale).reshape(b, sl, hkv, g, d)

    def step(carry, _):
        k_c, v_c, pos_c, m, num, den = carry
        # scores for this ring position: (B, Hkv, G, Sq, Skv)
        s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, k_c.astype(jnp.float32))
        mask = pos_c[:, None, None, None, :] <= q_pos[:, None, None, :, None]
        s = jnp.where(mask, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # guard chunks where nothing is visible yet (all -inf)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.exp(jnp.minimum(m - m_new, 0.0))
        alpha = jnp.where(jnp.isfinite(m), alpha, 0.0)
        e = jnp.exp(s - m_safe[..., None])
        e = jnp.where(mask, e, 0.0)
        num = num * alpha[..., None] + jnp.einsum(
            "bhgqk,bkhd->bhgqd", e, v_c.astype(jnp.float32))
        den = den * alpha + jnp.sum(e, axis=-1)
        # rotate k/v/pos to the next device on the ring
        perm = [(i, (i + 1) % p) for i in range(p)]
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        pos_c = jax.lax.ppermute(pos_c, axis_name, perm)
        return (k_c, v_c, pos_c, m_new, num, den), None

    # mark accumulators device-varying over the ring axis (shard_map vma)
    def _vary(x):
        return jax.lax.pcast(x, axis_name, to="varying")
    m0 = _vary(jnp.full((b, hkv, g, sl), -jnp.inf, jnp.float32))
    num0 = _vary(jnp.zeros((b, hkv, g, sl, d), jnp.float32))
    den0 = _vary(jnp.zeros((b, hkv, g, sl), jnp.float32))
    (_, _, _, _, num, den), _ = jax.lax.scan(
        step, (k, v, kv_pos, m0, num0, den0), None, length=p)
    out = num / jnp.maximum(den[..., None], 1e-20)
    return jnp.moveaxis(out, 3, 1).reshape(  # (B,Hkv,G,Sq,D)->(B,Sq,H,D)
        b, sl, hq, d).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, scale: Optional[float] = None,
                   axis_name: str = "sp"):
    """Causal self-attention with the sequence sharded over `axis_name`.

    q/k/v: GLOBAL (B, S, H[, kv], D) arrays (sharded or not — shard_map
    re-shards to P(None, axis, None, None)); S must divide evenly by the
    axis size. Returns (B, S, H, D) sharded the same way.
    """
    b, s, hq, d = q.shape
    p = mesh.shape[axis_name]
    assert s % p == 0, f"seq {s} not divisible by {axis_name}={p}"
    scale = scale if scale is not None else d ** -0.5
    sl = s // p

    # absolute positions per chunk, materialized under shard_map from the
    # device's coordinate so no global iota needs sharding
    def body(q_c, k_c, v_c):
        idx = jax.lax.axis_index(axis_name)
        pos = idx * sl + jnp.arange(sl, dtype=jnp.int32)
        pos = jnp.broadcast_to(pos, (q_c.shape[0], sl))
        return _ring_attention_local(q_c, k_c, v_c, pos, pos,
                                     axis_name, scale)

    spec = P(None, axis_name, None, None)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec)(q, k, v)


# ---------------------------------------------------------------------------
# Model integration: sequence-parallel scoring / prefill
# ---------------------------------------------------------------------------

_ACTIVE_SP_MESH: list = [None]


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_SP_MESH[0]


class use_ring_attention:
    """Trace-time switch: inside this context, models/common routes
    full-prefill attention through ring_attention over `mesh`'s 'sp' axis.
    Everything else in the forward (norms, GEMMs, rope) is position-local,
    so GSPMD shards it over the sequence automatically."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE_SP_MESH[0] = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_SP_MESH[0] = None
        return False


def sp_score(params, cfg, tokens: jax.Array, mesh: Mesh) -> jax.Array:
    """Logits for a (B, S) batch with S sharded over the 'sp' mesh axis.

    The long-context scoring path (reference chunked-context run.py:392 is
    the closest analogue; this exceeds it — no chunk serialization, the
    sequence lives distributed and attention is exact via the ring).
    S must divide by the sp size. KV cache is not returned (scoring).
    """
    from ..models import common as mcommon

    b, s = tokens.shape
    spec = NamedSharding(mesh, P(None, "sp"))
    tokens = jax.device_put(tokens, spec)
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    pos = jax.device_put(pos, spec)
    cache = mcommon.init_kv_cache(cfg, b, s)
    lens = jnp.full((b,), s, jnp.int32)

    with use_ring_attention(mesh):
        @functools.partial(jax.jit,
                           out_shardings=NamedSharding(mesh, P(None, "sp",
                                                               None)))
        def score(params, tokens, pos, cache, lens):
            logits, _ = mcommon.forward(params, cfg, tokens, pos, cache,
                                        lens, full_prefill=True)
            return logits

        return score(params, tokens, pos, cache, lens)
