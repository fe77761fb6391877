"""In-place paged KV write kernel (decode regime).

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

The kernel read-modify-writes the one target page per sequence: grid (B,),
the target page streams HBM->VMEM, the new token's row is selected in with
an iota==offset mask, and the page streams back to the SAME HBM buffer
(input_output_aliases) — ~0.5 MB per pool per sequence, no full-pool
traffic anywhere.
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
    sel3 = jax.lax.broadcasted_iota(jnp.int32, (h, bs, d), 1) == off
    ko_ref[0] = jnp.where(sel3, nk_ref[0][:, None, :], ki_ref[0])
    vo_ref[0] = jnp.where(sel3, nv_ref[0][:, None, :], vi_ref[0])
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
    ko_ref[0] = jnp.where(sel3, nk_ref[0][:, None, :], ki_ref[0])
    vo_ref[0] = jnp.where(sel3, nv_ref[0][:, None, :], vi_ref[0])


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
    new_spec = pl.BlockSpec((1, h, d), lambda i, pg, off: (i, 0, 0))
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
        )(pg, off, qk.astype(k4.dtype), qv.astype(v4.dtype),
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
    )(pg, off, new_k.astype(k4.dtype), new_v.astype(v4.dtype), k4, v4)
    return {"k": k4, "v": v4}
