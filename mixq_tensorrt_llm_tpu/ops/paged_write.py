"""In-place paged KV write kernels (decode token + prefill chunk).

Why a Pallas kernel for a scatter XLA can express: combining a
`dynamic_update_slice` pool write with a Pallas attention read of the same
scan-carried pool makes XLA copy-protect the ENTIRE pool once per layer
(~565 us per 185 MB pool at 7B/bs16 — measured, tools/probe_flatpool.py:
1623 us/layer with DUS+kernel vs 360 us/layer with this kernel; the DUS
alone is in-place at 137 us/layer, the kernel alone 350 us/layer). Alias
analysis cannot see through the attention custom call, so the write must
be a custom call too, with `input_output_aliases` declaring the in-place
update — then the whole decode step keeps the pool in one buffer.

Reference counterpart: the generation-phase KV append inside gpt_attention
(tensorrt_llm/functional.py:4475 — the plugin writes the new token's KV
into the paged pool before the masked MMHA reads it).

The decode kernel read-modify-writes the one target page per sequence:
grid (B,), the target page streams HBM->VMEM, the new token's row is
selected in with an iota==offset mask, and the page streams back to the
SAME HBM buffer (input_output_aliases) — ~0.5 MB per pool per sequence, no
full-pool traffic anywhere.

The chunk kernel (paged_write_chunk) is the same idea for the executor's
chunked prefill, which writes S page-aligned contiguous tokens per lane:
grid (B, S/BS), each step RMWs the one page its slab lands in. Before it
existed, S>1 writes went through an XLA scatter, and the scatter next to
the Pallas prefill-attention read of the scan-carried pool copy-protected
the whole multi-GB pool every layer: 748 ms per 4-lane 256-token chunk at
7B full depth — ~8x the dense-prefill rate (tools/probe_serving.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import resolve_interpret


def _write_kernel_quant(pg_ref, off_ref,
                        nk_ref, nv_ref, nks_ref, nvs_ref,
                        ki_ref, vi_ref, ksi_ref, vsi_ref,
                        ko_ref, vo_ref, kso_ref, vso_ref):
    i = pl.program_id(0)
    off = off_ref[i]
    h, bs, d = ki_ref.shape[1:]
    # new token arrives pre-shaped (1, h, 1, d): indexing [0] yields (h, 1, d)
    # whose sublane broadcast to (h, bs, d) Mosaic supports; an in-kernel
    # [:, None, :] would need a (1,h,d)->(h,1,d) relayout it cannot lower
    # for 16-bit types ("unsupported shape cast")
    sel3 = jax.lax.broadcasted_iota(jnp.int32, (h, bs, d), 1) == off
    ko_ref[0] = jnp.where(sel3, nk_ref[0], ki_ref[0])
    vo_ref[0] = jnp.where(sel3, nv_ref[0], vi_ref[0])
    sel2 = jax.lax.broadcasted_iota(jnp.int32, (h, bs), 1) == off
    kso_ref[0] = jnp.where(sel2, nks_ref[0, 0][:, None], ksi_ref[0])
    vso_ref[0] = jnp.where(sel2, nvs_ref[0, 0][:, None], vsi_ref[0])


def _write_kernel_plain(pg_ref, off_ref,
                        nk_ref, nv_ref,
                        ki_ref, vi_ref,
                        ko_ref, vo_ref):
    i = pl.program_id(0)
    off = off_ref[i]
    h, bs, d = ki_ref.shape[1:]
    sel3 = jax.lax.broadcasted_iota(jnp.int32, (h, bs, d), 1) == off
    ko_ref[0] = jnp.where(sel3, nk_ref[0], ki_ref[0])   # nk (h, 1, d)
    vo_ref[0] = jnp.where(sel3, nv_ref[0], vi_ref[0])


def paged_write_token(layer_caches: dict, pg: jax.Array, off: jax.Array,
                      new_k: jax.Array, new_v: jax.Array,
                      interpret=None) -> dict:
    """Write one token per sequence into pool pages, in place.

    layer_caches: {"k","v": (NP, H, BS, D)} [+ {"k_scale","v_scale":
      (NP, H, BS) f32} for int8 pools — new values are quantized here]
    pg:  (B,) page row per sequence (already offset for stacked layers;
         point masked-out lanes at a trash page)
    off: (B,) in-page slot
    new_k/new_v: (B, H, D)
    Returns the updated dict; the pool buffers are aliased (donated).

    Lanes must target DISTINCT pages (each sequence owns its blocks; beam
    search copies shared tail blocks before writing — BlockManager
    ensure_exclusive): each grid step RMWs from the original buffer, so
    same-page collisions are last-writer-wins. The only intended collision
    is the trash page (masked lanes -> row 0), whose content is garbage.
    """
    interpret = resolve_interpret(interpret)
    k4, v4 = layer_caches["k"], layer_caches["v"]
    np_, h, bs, d = k4.shape
    b = pg.shape[0]
    quantized = "k_scale" in layer_caches

    page_spec = pl.BlockSpec((1, h, bs, d), lambda i, pg, off: (pg[i], 0, 0, 0))
    scale_spec = pl.BlockSpec((1, h, bs), lambda i, pg, off: (pg[i], 0, 0))
    new_spec = pl.BlockSpec((1, h, 1, d), lambda i, pg, off: (i, 0, 0, 0))
    nscale_spec = pl.BlockSpec((1, 1, h), lambda i, pg, off: (i, 0, 0))

    if quantized:
        from ..quant import core as qcore
        qk, sk = qcore.quantize_kv(new_k)
        qv, sv = qcore.quantize_kv(new_v)
        ks4, vs4 = layer_caches["k_scale"], layer_caches["v_scale"]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(b,),
            in_specs=[new_spec, new_spec, nscale_spec, nscale_spec,
                      page_spec, page_spec, scale_spec, scale_spec],
            out_specs=[page_spec, page_spec, scale_spec, scale_spec],
        )
        k4, v4, ks4, vs4 = pl.pallas_call(
            _write_kernel_quant,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(k4.shape, k4.dtype),
                       jax.ShapeDtypeStruct(v4.shape, v4.dtype),
                       jax.ShapeDtypeStruct(ks4.shape, ks4.dtype),
                       jax.ShapeDtypeStruct(vs4.shape, vs4.dtype)],
            # operand indices include the scalar-prefetch args (pg=0, off=1)
            input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
            interpret=interpret,
        )(pg, off, qk.astype(k4.dtype)[:, :, None, :],
          qv.astype(v4.dtype)[:, :, None, :],
          sk[:, None, :].astype(ks4.dtype), sv[:, None, :].astype(vs4.dtype),
          k4, v4, ks4, vs4)
        return {"k": k4, "v": v4, "k_scale": ks4, "v_scale": vs4}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(b,),
        in_specs=[new_spec, new_spec, page_spec, page_spec],
        out_specs=[page_spec, page_spec],
    )
    k4, v4 = pl.pallas_call(
        _write_kernel_plain,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k4.shape, k4.dtype),
                   jax.ShapeDtypeStruct(v4.shape, v4.dtype)],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(pg, off, new_k.astype(k4.dtype)[:, :, None, :],
      new_v.astype(v4.dtype)[:, :, None, :], k4, v4)
    return {"k": k4, "v": v4}


def _chunk_kernel_quant(pg_ref, nk_ref, nv_ref, nks_ref, nvs_ref, m_ref,
                        ki_ref, vi_ref, ksi_ref, vsi_ref,
                        ko_ref, vo_ref, kso_ref, vso_ref):
    m = m_ref[0, 0, 0]                         # (BS,) int32 slot mask
    # reshape the i32 vector BEFORE comparing: Mosaic cannot insert minor
    # dims on i1 vectors ("not a no-op only supported for 32-bit types")
    sel3 = m[None, :, None] != 0
    ko_ref[0] = jnp.where(sel3, nk_ref[0, 0], ki_ref[0])
    vo_ref[0] = jnp.where(sel3, nv_ref[0, 0], vi_ref[0])
    sel2 = m[None, :] != 0
    kso_ref[0] = jnp.where(sel2, nks_ref[0, 0], ksi_ref[0])
    vso_ref[0] = jnp.where(sel2, nvs_ref[0, 0], vsi_ref[0])


def _chunk_kernel_plain(pg_ref, nk_ref, nv_ref, m_ref,
                        ki_ref, vi_ref, ko_ref, vo_ref):
    m = m_ref[0, 0, 0]
    sel3 = m[None, :, None] != 0
    ko_ref[0] = jnp.where(sel3, nk_ref[0, 0], ki_ref[0])
    vo_ref[0] = jnp.where(sel3, nv_ref[0, 0], vi_ref[0])


def paged_write_chunk(layer_caches: dict, blk: jax.Array, off: jax.Array,
                      new_k: jax.Array, new_v: jax.Array,
                      interpret=None) -> dict:
    """Write a page-aligned contiguous chunk per sequence, in place.

    layer_caches: as in paged_write_token.
    blk: (B, S) target page row per token — 0 (the reserved trash page)
         for tokens that must not land anywhere real.
    off: (B, S) in-page slot per token.
    new_k/new_v: (B, S, H, D) float; quantized here for int8 pools.

    Requires S % BS == 0 and CHUNK ALIGNMENT: every BS-token slab of a lane
    either lies entirely inside one page with off == 0..BS-1 in order (the
    executor's chunked prefill always satisfies this: chunks start at
    multiples of prefill_chunk, which is a multiple of the page size), or
    its tokens are trash-masked. Tokens whose off does not match their slab
    slot are dropped defensively (masked out) rather than written to a
    wrong slot — callers that cannot guarantee alignment must use the
    scatter path in runtime/kv_cache.paged_write instead.

    Like the token kernel, the only intended same-page collision across
    grid steps is the trash page; each slab otherwise owns its page.
    """
    interpret = resolve_interpret(interpret)
    k4, v4 = layer_caches["k"], layer_caches["v"]
    np_, h, bs, d = k4.shape
    b, s = blk.shape
    ns = s // bs
    assert ns * bs == s, (s, bs)
    quantized = "k_scale" in layer_caches

    blk_s = blk.reshape(b, ns, bs)
    pg = jnp.max(blk_s, axis=-1).astype(jnp.int32)          # (B, NS)
    mask = ((blk_s == pg[..., None]) & (pg[..., None] > 0)
            & (off.reshape(b, ns, bs)
               == jnp.arange(bs, dtype=off.dtype)[None, None, :]))
    # Mosaic needs >=8 sublanes on the mask block: tile it (B, NS, 8, BS)
    mask = jnp.broadcast_to(mask.astype(jnp.int32)[:, :, None, :],
                            (b, ns, 8, bs))

    def slab(a):     # (B, S, H, D) -> (B, NS, H, BS, D)
        return a.reshape(b, ns, bs, h, d).transpose(0, 1, 3, 2, 4)

    def sslab(a):    # (B, S, H) -> (B, NS, H, BS)
        return a.reshape(b, ns, bs, h).transpose(0, 1, 3, 2)

    page_spec = pl.BlockSpec((1, h, bs, d), lambda i, j, pg: (pg[i, j], 0, 0, 0))
    spage_spec = pl.BlockSpec((1, h, bs), lambda i, j, pg: (pg[i, j], 0, 0))
    slab_spec = pl.BlockSpec((1, 1, h, bs, d), lambda i, j, pg: (i, j, 0, 0, 0))
    sslab_spec = pl.BlockSpec((1, 1, h, bs), lambda i, j, pg: (i, j, 0, 0))
    mask_spec = pl.BlockSpec((1, 1, 8, bs), lambda i, j, pg: (i, j, 0, 0))

    if quantized:
        from ..quant import core as qcore
        qk, sk = qcore.quantize_kv(new_k)
        qv, sv = qcore.quantize_kv(new_v)
        ks4, vs4 = layer_caches["k_scale"], layer_caches["v_scale"]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b, ns),
            in_specs=[slab_spec, slab_spec, sslab_spec, sslab_spec,
                      mask_spec, page_spec, page_spec, spage_spec,
                      spage_spec],
            out_specs=[page_spec, page_spec, spage_spec, spage_spec],
        )
        k4, v4, ks4, vs4 = pl.pallas_call(
            _chunk_kernel_quant,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(k4.shape, k4.dtype),
                       jax.ShapeDtypeStruct(v4.shape, v4.dtype),
                       jax.ShapeDtypeStruct(ks4.shape, ks4.dtype),
                       jax.ShapeDtypeStruct(vs4.shape, vs4.dtype)],
            # operand indices include the scalar-prefetch arg (pg=0)
            input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
            interpret=interpret,
        )(pg, slab(qk.astype(k4.dtype)), slab(qv.astype(v4.dtype)),
          sslab(sk.astype(ks4.dtype)), sslab(sv.astype(vs4.dtype)),
          mask, k4, v4, ks4, vs4)
        return {"k": k4, "v": v4, "k_scale": ks4, "v_scale": vs4}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b, ns),
        in_specs=[slab_spec, slab_spec, mask_spec, page_spec, page_spec],
        out_specs=[page_spec, page_spec],
    )
    k4, v4 = pl.pallas_call(
        _chunk_kernel_plain,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k4.shape, k4.dtype),
                   jax.ShapeDtypeStruct(v4.shape, v4.dtype)],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(pg, slab(new_k.astype(k4.dtype)), slab(new_v.astype(v4.dtype)),
      mask, k4, v4)
    return {"k": k4, "v": v4}
