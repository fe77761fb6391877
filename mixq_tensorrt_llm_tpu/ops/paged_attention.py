"""Pallas TPU kernels: paged attention (decode + chunked prefill) with
in-kernel int8 KV dequant, per-block base positions, sliding window + sinks.

Replaces the reference's gpt_attention plugin with paged + int8 KV cache in
both phases (tensorrt_llm/functional.py:4475 context FMHA over paged KV +
the masked generation-phase MMHA; binary libnvinfer_plugin kernels; SURVEY
§2.3 item 6). KV pages stream HBM -> VMEM via the block-spec pipeline with
the page index scalar-prefetched from the block table, int8 pages are
dequantized in VMEM (HBM traffic stays 1 byte per cache entry), and no
(B, S, H, D) cache copy is ever materialized.

Positions are NOT inferred from the page index: a scalar-prefetched
`block_pos` table carries each page's absolute base position. This is what
makes StreamingLLM block recycling correct (reference plugin.py:172 +
kv_cache_manager.py:289-378): a recycled page keeps stale tokens in its
tail until overwritten, but those slots inherit the page's NEW base
position, which places them in the causal future — masked out with no
extra bookkeeping.

Decode kernel design (the round-2 rewrite): the round-1 kernel looped kv
heads with per-head (BS, D) x (G, D) matvecs — MXU-starved at G=1 and
measured DMA-equivalent ~80 GB/s. This version computes ALL query-head x
page-position logits in one (Hq, D) x (Hkv*BS, D)^T MXU dot and masks the
head-mismatched pairs; the wasted Hkv x multiply is ~67 MFLOP/page — noise
on the MXU — and both dequant scales apply to the small (Hq, Hkv*BS)
logits tile instead of the (Hkv*BS, D) page.

Prefill kernel: q chunks of 128 tokens (grid-tiled), per-kv-head
(G*128, BS) logit tiles — enough rows to feed the MXU — with flash-style
online softmax carried in VMEM scratch across the page scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import resolve_interpret

NEG_INF = -1e30
Q_TILE = 128     # prefill q rows per grid step


def _lane_stat(ref):
    """Read a lanes-broadcast (R, 128) scratch as its (R, 1) value."""
    return jnp.max(ref[:], axis=1, keepdims=True)


def _store_stat(ref, val):
    ref[:] = jnp.broadcast_to(val, ref.shape)


def _mask_positions(pos_kv, pos_q, window: int, sink: int):
    """Causal + optional StreamingLLM sliding-window mask on absolute
    positions. pos_kv/pos_q broadcastable int32 arrays."""
    keep = pos_kv <= pos_q
    if window:
        keep &= (pos_kv > pos_q - window) | (pos_kv < sink)
    return keep


# ---------------------------------------------------------------------------
# decode (q_len == 1)
# ---------------------------------------------------------------------------

def _decode_kernel(table_ref, bpos_ref, lens_ref, qstart_ref,   # prefetch
                   q_ref, k_ref, v_ref, ks_ref, vs_ref,    # inputs
                   *refs,                                  # outputs + scratch
                   bs, hkv, g, scale, quantized, window, sink, s=1,
                   softcap=0.0, stats=False):
    """s == 1 is the decode hot path; s > 1 (small verify chunks —
    speculative decoding's gamma+1 rows) flattens queries onto the row
    axis as (S, Hq) with per-row causal positions qstart + row//Hq."""
    if stats:
        # stats mode also emits the online-softmax running (m, l) so a
        # caller can MERGE this result with attention over extra KV the
        # pool does not hold (beam-burst dense tails, runtime/beam.py) or
        # across page splits (flash-decoding combine)
        out_ref, m_out_ref, l_out_ref, acc_ref, m_ref, l_ref = refs
    else:
        out_ref, acc_ref, m_ref, l_ref = refs
        m_out_ref = l_out_ref = None
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    hq = hkv * g
    rows = s * hq

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]
    base = bpos_ref[b, j]

    # padded table entries carry base = PAD_POS (host contract) and skip;
    # their table ids repeat the row's last real block so the block-spec
    # pipeline elides the re-fetch (same index -> no DMA)
    @pl.when(base < seq_len)
    def _():
        # (S*Hq, Hkv*BS) all-pairs logits in one MXU dot; both operands
        # keep D on lanes (k2 rows are page entries, flattened outside)
        k2 = k_ref[0].astype(jnp.bfloat16)                 # (Hkv*BS, D)
        q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
        logits = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (S*Hq, Hkv*BS)
        if quantized:
            logits = logits * ks_ref[0].astype(jnp.float32)  # (1, Hkv*BS)
        if softcap:
            # Gemma-2 attn_logit_softcapping: tanh cap on the full
            # (dequantized) logits, before masking — same order as
            # ops/ref.attention
            logits = jnp.tanh(logits / softcap) * softcap

        row = jax.lax.broadcasted_iota(jnp.int32, (rows, hkv * bs), 0)
        row_h = (row % hq) // g
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, hkv * bs), 1)
        pos = base + col % bs
        qpos = qstart_ref[b] + row // hq    # == seq_len - 1 when s == 1
        keep = (row_h == col // bs) & \
            _mask_positions(pos, qpos, window, sink)
        logits = jnp.where(keep, logits, NEG_INF)

        m_prev = _lane_stat(m_ref)                         # (Hq, 1)
        l_prev = _lane_stat(l_ref)
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        # clamp the subtrahend so fully-masked rows give exp(-inf) = 0, not
        # exp(NEG_INF - NEG_INF) = 1 (happens when a page is entirely
        # outside a row's window)
        p = jnp.exp(logits - jnp.maximum(m_new, 0.5 * NEG_INF))
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        if quantized:
            p = p * vs_ref[0].astype(jnp.float32)
        v2 = v_ref[0].astype(jnp.bfloat16)                 # (Hkv*BS, D)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Hq, D)
        acc_ref[:] = acc_ref[:] * alpha + pv
        _store_stat(m_ref, m_new)
        _store_stat(l_ref, l_new)

    @pl.when(j == n_blocks - 1)
    def _():
        # stats mode keeps the normalized output in f32 (out_shape is f32
        # there): the caller merges parts in f32 and casts once
        out_ref[0] = (acc_ref[:] /
                      jnp.maximum(_lane_stat(l_ref), 1e-20)
                      ).astype(out_ref.dtype)
        if stats:
            m_out_ref[0] = m_ref[:]
            l_out_ref[0] = l_ref[:]


@functools.partial(jax.jit, static_argnames=("scale", "window", "sink",
                                             "softcap", "stats",
                                             "interpret"))
def paged_decode_attention(q, k_pages, v_pages, k_scale, v_scale,
                           block_table, lens, scale: float,
                           block_pos=None, window: int = 0, sink: int = 0,
                           softcap: float = 0.0, stats: bool = False,
                           interpret=None):
    """q (B, Hq, D); k/v pages (NB, Hkv, BS, D) [+ scales (NB, Hkv, BS) when
    int8]; block_table/block_pos (B, MB) int32 page ids / base positions;
    lens (B,) kv lengths -> (B, Hq, D).

    On TPU (compiled) the block size must be a multiple of 128 so scale
    pages slice cleanly on lanes; interpret mode has no such constraint.
    block_pos defaults to j*BS (non-windowed layouts).

    stats=True additionally returns the per-head online-softmax running
    max and denominator as (out, m (B, Hq), l (B, Hq)) so callers can
    exactly merge with attention over KV outside the pool (see
    ops.ref.merge_attention_stats).
    """
    return _paged_mq_attention(q, k_pages, v_pages, k_scale, v_scale,
                               block_table, lens, lens - 1, scale, 1,
                               block_pos=block_pos, window=window,
                               sink=sink, softcap=softcap, stats=stats,
                               interpret=interpret)


@functools.partial(jax.jit, static_argnames=("scale", "window", "sink",
                                             "softcap", "interpret"))
def paged_verify_attention(q, k_pages, v_pages, k_scale, v_scale,
                           block_table, lens, qstart, scale: float,
                           block_pos=None, window: int = 0, sink: int = 0,
                           softcap: float = 0.0, interpret=None):
    """Small-q causal attention over the paged pool: q (B, S, Hq, D) with
    queries at absolute positions qstart .. qstart+S-1 -> (B, S, Hq, D).

    The speculative-verify path (gamma+1 draft rows per lane, reference
    executor draft-token verification): S is far below the prefill
    kernel's 128-row tile, so the rows ride the DECODE kernel's row axis
    as (S, Hq) with per-row causal positions — no pool materialization."""
    b, s, hq, d = q.shape
    out = _paged_mq_attention(q.reshape(b, s * hq, d), k_pages, v_pages,
                              k_scale, v_scale, block_table, lens, qstart,
                              scale, s, block_pos=block_pos, window=window,
                              sink=sink, softcap=softcap,
                              interpret=interpret)
    return out.reshape(b, s, hq, d)


def _paged_mq_attention(q, k_pages, v_pages, k_scale, v_scale,
                        block_table, lens, qstart, scale: float, s: int,
                        block_pos=None, window: int = 0, sink: int = 0,
                        softcap: float = 0.0, stats: bool = False,
                        interpret=None):
    interpret = resolve_interpret(interpret)
    b, rows, d = q.shape
    nb, hkv, bs, _ = k_pages.shape
    mb = block_table.shape[1]
    hq = rows // s
    g = hq // hkv
    quantized = k_scale is not None
    if not interpret and quantized:
        assert bs % 128 == 0, (
            f"paged decode kernel needs block_size % 128 == 0 with int8 KV "
            f"(got {bs})")
    if block_pos is None:
        block_pos = jnp.broadcast_to(
            jnp.arange(mb, dtype=jnp.int32)[None, :] * bs, (b, mb))

    if not quantized:   # feed dummy scale refs so the kernel arity is fixed
        k_scale = jnp.ones((nb, hkv, bs), jnp.float32)
        v_scale = k_scale

    # flatten pages to 2D entry-major views (layout no-op: (Hkv, BS, D) is
    # contiguous) so the kernel's dots are plain 2D matmuls; scales keep a
    # singleton sublane dim — Mosaic requires block last-two dims either
    # (8k, 128k)-divisible or equal to the array's, and (1, Hkv*BS) on a
    # (NB, 1, Hkv*BS) array satisfies the latter
    k2 = k_pages.reshape(nb, hkv * bs, d)
    v2 = v_pages.reshape(nb, hkv * bs, d)
    ks2 = k_scale.reshape(nb, 1, hkv * bs)
    vs2 = v_scale.reshape(nb, 1, hkv * bs)

    out_spec = pl.BlockSpec((1, rows, d),
                            lambda i, j, table, bpos, lens, qs: (i, 0, 0))
    stat_spec = pl.BlockSpec((1, rows, 128),
                             lambda i, j, table, bpos, lens, qs: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, rows, d),
                                     jnp.float32 if stats else jnp.bfloat16)
    stat_shape = jax.ShapeDtypeStruct((b, rows, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, mb),
        in_specs=[
            pl.BlockSpec((1, rows, d),
                         lambda i, j, table, bpos, lens, qs: (i, 0, 0)),
            pl.BlockSpec((1, hkv * bs, d),
                         lambda i, j, table, bpos, lens, qs:
                         (table[i, j], 0, 0)),
            pl.BlockSpec((1, hkv * bs, d),
                         lambda i, j, table, bpos, lens, qs:
                         (table[i, j], 0, 0)),
            pl.BlockSpec((1, 1, hkv * bs),
                         lambda i, j, table, bpos, lens, qs:
                         (table[i, j], 0, 0)),
            pl.BlockSpec((1, 1, hkv * bs),
                         lambda i, j, table, bpos, lens, qs:
                         (table[i, j], 0, 0)),
        ],
        out_specs=[out_spec, stat_spec, stat_spec] if stats else out_spec,
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),  # m (running max, lanes-bcast)
            pltpu.VMEM((rows, 128), jnp.float32),  # l (running denom)
        ],
    )

    kernel = functools.partial(_decode_kernel, bs=bs, hkv=hkv, g=g,
                               scale=scale, quantized=quantized,
                               window=window, sink=sink, s=s,
                               softcap=softcap, stats=stats)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=([out_shape, stat_shape, stat_shape] if stats
                   else out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_table, block_pos, lens, qstart.astype(jnp.int32),
      q, k2, v2, ks2, vs2)
    if stats:
        o, m, l = out
        # the (rows, 128) stat tiles are lanes-broadcast; column 0 is the value
        return o, m[:, :, 0], l[:, :, 0]
    return out


# ---------------------------------------------------------------------------
# chunked prefill (q_len > 1)
# ---------------------------------------------------------------------------

def _prefill_kernel(table_ref, bpos_ref, qstart_ref, lens_ref,   # prefetch
                    q_ref, k_ref, v_ref, ks_ref, vs_ref,
                    out_ref,
                    acc_ref, m_ref, l_ref,
                    *, bs, hkv, g, c, scale, quantized, window, sink,
                    softcap=0.0):
    b = pl.program_id(0)
    j = pl.program_id(2)          # page scan is innermost
    n_blocks = pl.num_programs(2)
    rows = g * c                  # q rows per kv head (head-major layout)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    seq_len = lens_ref[b]
    q_start = qstart_ref[b] + pl.program_id(1) * c
    base = bpos_ref[b, j]

    # page overlaps this q tile's causal range? (pages past the tile's last
    # position contribute nothing; skipping them skips their whole update;
    # padded table entries carry base = PAD_POS and always skip)
    @pl.when(base <= q_start + c - 1)
    def _():
        m_all = m_ref[:]
        l_all = l_ref[:]
        acc_all = acc_ref[:]
        m_parts, l_parts, acc_parts = [], [], []
        pos_kv = base + jax.lax.broadcasted_iota(jnp.int32, (rows, bs), 1)
        pos_q = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (rows, bs), 0) % c
        keep = (pos_kv < seq_len) & \
            _mask_positions(pos_kv, pos_q, window, sink)

        for h in range(hkv):
            k_h = k_ref[0, h].astype(jnp.bfloat16)           # (BS, D)
            q_h = (q_ref[0, pl.ds(h * rows, rows), :].astype(jnp.float32)
                   * scale).astype(jnp.bfloat16)             # (G*C, D)
            logits = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (G*C, BS)
            if quantized:
                logits = logits * ks_ref[0, h][None, :].astype(jnp.float32)
            if softcap:
                logits = jnp.tanh(logits / softcap) * softcap
            logits = jnp.where(keep, logits, NEG_INF)

            m_prev = jnp.max(m_all[h * rows:(h + 1) * rows], axis=1,
                             keepdims=True)
            l_prev = jnp.max(l_all[h * rows:(h + 1) * rows], axis=1,
                             keepdims=True)
            m_new = jnp.maximum(m_prev,
                                jnp.max(logits, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            # clamped so fully-masked rows contribute 0 (see decode kernel)
            p = jnp.exp(logits - jnp.maximum(m_new, 0.5 * NEG_INF))
            l_parts.append(jnp.broadcast_to(
                l_prev * alpha + jnp.sum(p, axis=1, keepdims=True),
                (rows, 128)))
            if quantized:
                p = p * vs_ref[0, h][None, :].astype(jnp.float32)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_ref[0, h].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (G*C, D)
            acc_parts.append(acc_all[h * rows:(h + 1) * rows] * alpha + pv)
            m_parts.append(jnp.broadcast_to(m_new, (rows, 128)))

        m_ref[:] = jnp.concatenate(m_parts, axis=0)
        l_ref[:] = jnp.concatenate(l_parts, axis=0)
        acc_ref[:] = jnp.concatenate(acc_parts, axis=0)

    @pl.when(j == n_blocks - 1)
    def _():
        out_ref[0] = (acc_ref[:] /
                      jnp.maximum(_lane_stat(l_ref), 1e-20)
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "window", "sink",
                                             "softcap", "interpret"))
def paged_prefill_attention(q, k_pages, v_pages, k_scale, v_scale,
                            block_table, q_start, lens, scale: float,
                            block_pos=None, window: int = 0, sink: int = 0,
                            softcap: float = 0.0, interpret=None):
    """Chunked-prefill attention over the paged pool.

    q (B, C, Hq, D) — C % 128 == 0 query tokens at absolute positions
    q_start[b] + 0..C-1 (rows beyond the real prompt are garbage-in,
    garbage-out: callers mask by position); k/v pages as in decode;
    lens (B,) = total kv written (>= q_start + valid chunk len).
    Returns (B, C, Hq, D) bf16.

    The kernel never materializes the gathered cache — this is the
    replacement for the paged_gather path on the chunked-prefill hot loop
    (reference context FMHA with paged KV, functional.py:4475).
    """
    interpret = resolve_interpret(interpret)
    b, c, hq, d = q.shape
    nb, hkv, bs, _ = k_pages.shape
    mb = block_table.shape[1]
    g = hq // hkv
    quantized = k_scale is not None
    if not interpret:
        assert c % Q_TILE == 0, f"chunk {c} must be a multiple of {Q_TILE}"
        if quantized:
            assert bs % 128 == 0, f"int8 KV needs block_size % 128 (got {bs})"
    tile = Q_TILE if c % Q_TILE == 0 else c
    n_ct = c // tile
    if block_pos is None:
        block_pos = jnp.broadcast_to(
            jnp.arange(mb, dtype=jnp.int32)[None, :] * bs, (b, mb))
    if not quantized:
        k_scale = jnp.ones((nb, hkv, bs), jnp.float32)
        v_scale = k_scale

    # head-major q rows inside each tile slab: row (h*G + g')*tile + c', so
    # each kv head's rows are one contiguous static slice (no in-kernel
    # reshape/relayout, which Mosaic handles poorly — docs/PERF.md)
    qr = (q.transpose(0, 2, 1, 3)            # (B, Hq, C, D)
          .reshape(b, hq, n_ct, tile, d)
          .transpose(0, 2, 1, 3, 4)          # (B, n_ct, Hq, tile, D)
          .reshape(b, n_ct * hq * tile, d))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n_ct, mb),
        in_specs=[
            pl.BlockSpec((1, hq * tile, d),
                         lambda i, t, j, *_: (i, t, 0)),
            pl.BlockSpec((1, hkv, bs, d),
                         lambda i, t, j, table, *_: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, hkv, bs, d),
                         lambda i, t, j, table, *_: (table[i, j], 0, 0, 0)),
            pl.BlockSpec((1, hkv, bs),
                         lambda i, t, j, table, *_: (table[i, j], 0, 0)),
            pl.BlockSpec((1, hkv, bs),
                         lambda i, t, j, table, *_: (table[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hq * tile, d),
                               lambda i, t, j, *_: (i, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq * tile, d), jnp.float32),
            pltpu.VMEM((hq * tile, 128), jnp.float32),
            pltpu.VMEM((hq * tile, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(_prefill_kernel, bs=bs, hkv=hkv, g=g, c=tile,
                               scale=scale, quantized=quantized,
                               window=window, sink=sink, softcap=softcap)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_ct * hq * tile, d),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(block_table, block_pos, q_start, lens, qr, k_pages, v_pages,
      k_scale, v_scale)

    out = (out.reshape(b, n_ct, hq, tile, d)
           .transpose(0, 2, 1, 3, 4)
           .reshape(b, hq, c, d)
           .transpose(0, 2, 1, 3))
    return out


@functools.partial(jax.jit, static_argnames=("scale", "window", "sink",
                                             "softcap", "kv_splits",
                                             "interpret"))
def paged_decode_attention_split(q, k_pages, v_pages, k_scale, v_scale,
                                 block_table, lens, scale: float,
                                 block_pos=None, window: int = 0,
                                 sink: int = 0, softcap: float = 0.0,
                                 kv_splits: int = 2, interpret=None):
    """Flash-decoding-style decode attention: each lane's page list is
    SPLIT across kv_splits grid rows that scan their slice independently
    (reference --multi_block_mode, /root/reference/utils.py common args —
    long-KV work split across blocks and combined). The split rows ride
    the kernel's PARALLEL grid axis, so a single long-context lane can
    occupy multiple cores where the serial page scan could not; partials
    are combined exactly with the online-softmax merge
    (ops.ref.merge_attention_stats).

    Same contract as paged_decode_attention; block_table width must be
    padded to a multiple of kv_splits (host tables already pad with the
    last real block + PAD_POS base, which skips with no DMA).
    """
    from .ref import merge_attention_stats
    b, hq, d = q.shape
    mb = block_table.shape[1]
    s = kv_splits
    if mb % s:
        pad = s - mb % s
        block_table = jnp.concatenate(
            [block_table, jnp.repeat(block_table[:, -1:], pad, 1)], axis=1)
        if block_pos is None:
            bs_blk = k_pages.shape[2]
            block_pos = jnp.broadcast_to(
                jnp.arange(mb, dtype=jnp.int32)[None, :] * bs_blk, (b, mb))
        block_pos = jnp.concatenate(
            [block_pos, jnp.full((b, pad), jnp.int32(1 << 30))], axis=1)
        mb += pad
    elif block_pos is None:
        bs_blk = k_pages.shape[2]
        block_pos = jnp.broadcast_to(
            jnp.arange(mb, dtype=jnp.int32)[None, :] * bs_blk, (b, mb))

    table2 = block_table.reshape(b * s, mb // s)
    bpos2 = block_pos.reshape(b * s, mb // s)
    q2 = jnp.repeat(q, s, axis=0)
    lens2 = jnp.repeat(lens, s, axis=0)
    out, m, l = _paged_mq_attention(
        q2, k_pages, v_pages, k_scale, v_scale, table2, lens2, lens2 - 1,
        scale, 1, block_pos=bpos2, window=window, sink=sink,
        softcap=softcap, stats=True, interpret=interpret)
    out = out.reshape(b, s, hq, d)
    m = m.reshape(b, s, hq)
    l = l.reshape(b, s, hq)
    parts = [(out[:, i][:, None], m[:, i][:, :, None], l[:, i][:, :, None])
             for i in range(s)]
    return merge_attention_stats(parts)[:, 0].astype(jnp.bfloat16)
