"""Paged KV cache: block pool + block tables, host-side block manager.

TPU-native re-design of the reference's paged KV stack
(tensorrt_llm/runtime/kv_cache_manager.py — BlocksManager ref-counted pages
:66-244, KVCacheManager sliding/sink windows :246-378): device state is a
fixed FLAT block pool (L*num_blocks, Hkv, block_size, D) addressed through
int32 block tables (per-sequence page lists; layer l's block b lives at row
l*num_blocks + b), so variable-length sequences live in static shapes and
the decode step stays a single compiled program. The pool is flat — layers
folded into the page axis — so the whole pool rides the layer scan as ONE
carry and the aliased Pallas write keeps it in place (see
models.common.forward_paged; stacked per-layer pools cost ~1.6 ms/layer in
full-pool copies at 7B/bs16, tools/probe_flatpool.py).
The free-list/refcount logic is host-side Python exactly like the
reference's (it is control plane, not data plane).

Sliding-window + sink ("StreamingLLM", reference plugin.py:172 +
kv_cache_manager.py:289-330) maps to block-table surgery: when a sequence
exceeds the window, the oldest non-sink block is recycled in place. Every
block carries an absolute BASE POSITION (`bases`, exported as the
block_pos table) so attention masks work on true positions: a recycled
page's stale tail slots inherit the page's new base, land in the causal
future, and mask out with no per-slot bookkeeping.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import ModelConfig
from ..quant.config import KVCacheQuantAlgo
from ..quant import core as qcore

# base position marking a padded block_pos entry: larger than any real
# position, so kernels and masks treat the slot as causally unreachable
PAD_POS = np.int32(1 << 30)


class PagedKVState(NamedTuple):
    """Device-side pool, FLAT over layers: layer l's block b is page row
    l*num_blocks + b (forward_paged fuses the layer offset into the block
    table inside the layer scan). int8 mode carries per-entry scales.

    Scale pages are laid out (pages, Hkv, block_size) — block_size on
    lanes — because Mosaic requires 128-aligned lane slices and Hkv is
    usually < 128 (use block_size >= 128 with the TPU decode kernel)."""

    k: jax.Array            # (L * num_blocks, Hkv, block_size, D)
    v: jax.Array
    k_scale: Optional[jax.Array] = None   # (L*num_blocks, Hkv, block_size)
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def block_size(self) -> int:
        return self.k.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k.shape[0]


def init_paged_kv(cfg: ModelConfig, num_blocks: int,
                  block_size: int = 64) -> PagedKVState:
    shape = (cfg.num_layers * num_blocks, cfg.num_kv_heads, block_size,
             cfg.head_dim)
    if cfg.quant.kv_cache != KVCacheQuantAlgo.NONE:
        qdt = (jnp.int8 if cfg.quant.kv_cache == KVCacheQuantAlgo.INT8
               else jnp.float8_e4m3fn)
        sshape = (cfg.num_layers * num_blocks, cfg.num_kv_heads, block_size)
        return PagedKVState(
            k=jnp.zeros(shape, qdt), v=jnp.zeros(shape, qdt),
            k_scale=jnp.ones(sshape, jnp.float32),
            v_scale=jnp.ones(sshape, jnp.float32))
    return PagedKVState(k=jnp.zeros(shape, cfg.dtype),
                        v=jnp.zeros(shape, cfg.dtype))


@dataclasses.dataclass
class SequenceBlocks:
    seq_id: int
    blocks: List[int]
    bases: List[int]       # absolute base position of each block
    length: int = 0        # tokens currently stored


class BlockManager:
    """Host-side free list + per-sequence block accounting.

    Mirrors the reference BlocksManager (kv_cache_manager.py:66-244) minus
    beam-width sharing (beams arrive with beam search); ref counts are kept
    so prefix sharing can reuse blocks later.
    """

    def __init__(self, num_blocks: int, block_size: int,
                 sink_blocks: int = 0, window_blocks: Optional[int] = None):
        self.num_blocks = num_blocks
        self.block_size = block_size
        # block 0 is reserved as the trash block for masked padding writes
        self.free: List[int] = list(range(1, num_blocks))
        self.ref_counts = np.zeros((num_blocks,), np.int32)
        self.seqs: Dict[int, SequenceBlocks] = {}
        self.sink_blocks = sink_blocks
        self.window_blocks = window_blocks   # max non-sink blocks per seq
        # content-addressed prefix cache (reference executor
        # enableBlockReuse): chain-key -> block id. Registered blocks hold
        # +1 refcount owned by the cache; insertion order is the LRU for
        # eviction when the free pool runs dry.
        self.prefix_cache: Dict[tuple, int] = {}
        self._prefix_of_block: Dict[int, tuple] = {}

    # ------------------------------------------------------------------
    def blocks_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.block_size)

    def _evictable(self) -> int:
        """Cached blocks owned ONLY by the cache (refcount 1) — the ones
        eviction can actually return to the free pool."""
        return sum(1 for b in self._prefix_of_block
                   if self.ref_counts[b] == 1)

    def can_allocate(self, num_tokens: int) -> bool:
        return (len(self.free) + self._evictable()
                >= self.blocks_needed(num_tokens))

    def _take_free(self) -> int:
        """Pop a free block, evicting the oldest cached prefix if dry."""
        if not self.free:
            self._reclaim(1)
        if not self.free:
            raise RuntimeError("KV pool exhausted")
        return self.free.pop()

    def _reclaim(self, n: int) -> None:
        """Evict up to n EXCLUSIVELY cache-owned entries (oldest first);
        entries whose block is still shared with a live sequence stay
        cached (evicting them would free nothing and lose reuse)."""
        for key in list(self.prefix_cache):
            if n <= 0:
                break
            b = self.prefix_cache[key]
            if self.ref_counts[b] != 1:
                continue
            del self.prefix_cache[key]
            self._prefix_of_block.pop(b, None)
            self.ref_counts[b] = 0
            self.free.append(b)
            n -= 1

    @property
    def prefix_cache_size(self) -> int:
        return len(self.prefix_cache)

    # --- prefix caching (reference executor enableBlockReuse) ----------
    def _keys_for(self, tokens: List[int]) -> List[tuple]:
        """Chain keys for each FULL block of `tokens`: block i's key
        commits to the whole prefix, so equal keys => equal KV content."""
        keys = []
        prev_key: tuple = ()
        bs = self.block_size
        for i in range(len(tokens) // bs):
            prev_key = (prev_key, tuple(tokens[i * bs:(i + 1) * bs]))
            keys.append(prev_key)
        return keys

    def add_sequence_cached(self, seq_id: int, tokens: List[int]
                            ) -> Tuple["SequenceBlocks", int]:
        """add_sequence that ADOPTS cached full-prefix blocks whose content
        matches `tokens` (reference enableBlockReuse). Returns (blocks,
        cached_token_count); cached blocks are shared read-only (writes
        only ever target positions beyond them). At least one token is
        always left uncached so the prefill emits last-position logits."""
        assert seq_id not in self.seqs
        keys = self._keys_for(tokens[:len(tokens) - 1])
        adopted: List[int] = []
        for key in keys:
            b = self.prefix_cache.get(key)
            if b is None:
                break
            adopted.append(b)
        cached = len(adopted) * self.block_size
        need = self.blocks_needed(max(len(tokens), 1)) - len(adopted)
        if len(self.free) + self._evictable() < need:
            raise RuntimeError("KV pool exhausted")
        for b in adopted:
            self.ref_counts[b] += 1
        blocks = adopted + [self._take_free() for _ in range(need)]
        for b in blocks[len(adopted):]:
            self.ref_counts[b] += 1
        sb = SequenceBlocks(seq_id, blocks,
                            [i * self.block_size
                             for i in range(len(blocks))], len(tokens))
        self.seqs[seq_id] = sb
        return sb, cached

    def register_prefix(self, seq_id: int, tokens: List[int],
                        upto: int) -> None:
        """Register the sequence's full blocks covering tokens[:upto] in
        the prefix cache (call after their KV is actually written)."""
        sb = self.seqs[seq_id]
        keys = self._keys_for(list(tokens)[:upto])
        for i, key in enumerate(keys):
            b = sb.blocks[i]
            if key in self.prefix_cache or b in self._prefix_of_block:
                continue
            self.prefix_cache[key] = b
            self._prefix_of_block[b] = key
            self.ref_counts[b] += 1

    def add_sequence(self, seq_id: int, num_tokens: int) -> SequenceBlocks:
        assert seq_id not in self.seqs, f"sequence {seq_id} already active"
        n = self.blocks_needed(max(num_tokens, 1))
        if not self.can_allocate(max(num_tokens, 1)):
            raise RuntimeError(
                f"KV pool exhausted: need {n} blocks, have {len(self.free)}")
        blocks = [self._take_free() for _ in range(n)]
        for b in blocks:
            self.ref_counts[b] += 1
        sb = SequenceBlocks(seq_id, blocks,
                            [i * self.block_size for i in range(n)],
                            num_tokens)
        self.seqs[seq_id] = sb
        return sb

    def extend(self, seq_id: int, new_tokens: int = 1) -> SequenceBlocks:
        """Grow a sequence; allocates (or recycles, when windowed) blocks."""
        sb = self.seqs[seq_id]
        target = sb.length + new_tokens
        while sb.bases[-1] + self.block_size < target:
            next_base = sb.bases[-1] + self.block_size
            if self.window_blocks is not None and \
                    len(sb.blocks) >= self.sink_blocks + self.window_blocks:
                # sliding window: recycle the oldest non-sink block in place;
                # it moves to the tail with a fresh base position (stale
                # slots land in the causal future until overwritten)
                blk = sb.blocks.pop(self.sink_blocks)
                sb.bases.pop(self.sink_blocks)
                sb.blocks.append(blk)
                sb.bases.append(next_base)
                continue
            blk = self._take_free()
            self.ref_counts[blk] += 1
            sb.blocks.append(blk)
            sb.bases.append(next_base)
        sb.length = target
        return sb

    def rewind(self, seq_id: int, new_length: int) -> SequenceBlocks:
        """Shrink a sequence to new_length tokens, freeing tail blocks that
        fall entirely beyond it (draft-token rewind, reference
        runtime/kv_cache_manager.py KVCacheUpdater:380-464). Windowed
        managers cannot rewind across recycled pages."""
        assert self.window_blocks is None, "rewind unsupported with windows"
        sb = self.seqs[seq_id]
        assert 1 <= new_length <= sb.length, (new_length, sb.length)
        while len(sb.blocks) > 1 and sb.bases[-1] >= new_length:
            b = sb.blocks.pop()
            sb.bases.pop()
            self.ref_counts[b] -= 1
            if self.ref_counts[b] == 0:
                self.free.append(b)
        sb.length = new_length
        return sb

    def free_sequence(self, seq_id: int) -> None:
        sb = self.seqs.pop(seq_id)
        for b in sb.blocks:
            self.ref_counts[b] -= 1
            if self.ref_counts[b] == 0:
                self.free.append(b)

    def fork(self, src_seq_id: int, dst_seq_id: int) -> SequenceBlocks:
        """Share all blocks (prefix sharing / beam fork); copy-on-write is
        the caller's job when it writes into a shared tail block (use
        ensure_exclusive before writing)."""
        src = self.seqs[src_seq_id]
        for b in src.blocks:
            self.ref_counts[b] += 1
        sb = SequenceBlocks(dst_seq_id, list(src.blocks), list(src.bases),
                            src.length)
        self.seqs[dst_seq_id] = sb
        return sb

    def ensure_exclusive(self, seq_id: int, pos: int):
        """Copy-on-write: make the block covering absolute position `pos`
        exclusively owned by `seq_id` (reference kv_cache_manager beam-width
        block sharing: shared blocks are duplicated before a beam writes
        into them). Returns (src_block, dst_block) when a device-side page
        copy is required, else None."""
        sb = self.seqs[seq_id]
        for j in range(len(sb.blocks) - 1, -1, -1):
            if sb.bases[j] <= pos < sb.bases[j] + self.block_size:
                break
        else:
            raise ValueError(f"position {pos} not covered by seq {seq_id}")
        blk = sb.blocks[j]
        if self.ref_counts[blk] <= 1:
            return None
        if not self.free:
            raise RuntimeError("KV pool exhausted during copy-on-write")
        new = self.free.pop()
        self.ref_counts[new] += 1
        self.ref_counts[blk] -= 1
        sb.blocks[j] = new
        return (blk, new)

    # ------------------------------------------------------------------
    def block_table(self, seq_ids: List[int], max_blocks: int) -> np.ndarray:
        """(len(seq_ids), max_blocks) int32. Padded entries repeat the last
        real block: the Pallas pipeline skips the re-fetch when consecutive
        grid steps resolve to the same page, so padding costs no DMA; the
        matching block_pos padding (PAD_POS) masks them out."""
        out = np.zeros((len(seq_ids), max_blocks), np.int32)
        for i, sid in enumerate(seq_ids):
            blocks = self.seqs[sid].blocks
            assert len(blocks) <= max_blocks, (len(blocks), max_blocks)
            out[i, :len(blocks)] = blocks
            if blocks:
                out[i, len(blocks):] = blocks[-1]
        return out

    def block_pos(self, seq_ids: List[int], max_blocks: int) -> np.ndarray:
        """(len(seq_ids), max_blocks) int32 absolute base positions, padded
        with PAD_POS (causally unreachable)."""
        out = np.full((len(seq_ids), max_blocks), PAD_POS, np.int32)
        for i, sid in enumerate(seq_ids):
            bases = self.seqs[sid].bases
            out[i, :len(bases)] = bases
        return out

    @property
    def num_free(self) -> int:
        return len(self.free)


# ---------------------------------------------------------------------------
# Device-side paged ops (jnp reference; Pallas paged attention later)
# ---------------------------------------------------------------------------

def paged_write(layer_caches, block_table: jax.Array,
                write_pos: jax.Array, new_k: jax.Array, new_v: jax.Array,
                quantized: bool, valid: Optional[jax.Array] = None,
                block_pos: Optional[jax.Array] = None,
                use_kernels: bool = True, mesh=None):
    """Scatter new kv at absolute positions into the pool (one layer view).

    layer_caches: dict of flat pools {k (L*NB,H,BS,D), ...}
    block_table:  (B, max_blocks) int32 — GLOBAL page rows (the caller
                  folds the layer offset in: layer*NB + block)
    write_pos:    (B, S) absolute token positions
    new_k/new_v:  (B, S, H, D)
    valid:        (B, S) bool; invalid (padding) writes are redirected to
                  block 0, which BlockManager reserves as a trash block so
                  padding can never corrupt another sequence's pages.
    block_pos:    (B, max_blocks) absolute base position per table entry
                  (BlockManager.block_pos). None = identity layout
                  (entry j covers positions [j*BS, (j+1)*BS)); required for
                  windowed/recycled tables, where a position's entry is
                  found by base matching instead of division.
    """
    bs = layer_caches["k"].shape[2]
    mb = block_table.shape[1]
    if block_pos is None:
        blk_idx = jnp.clip(write_pos // bs, 0, mb - 1)
        found = None
    else:
        want = (write_pos // bs) * bs                        # (B, S)
        eq = block_pos[:, None, :] == want[:, :, None]       # (B, S, MB)
        blk_idx = jnp.argmax(eq, axis=-1).astype(write_pos.dtype)
        found = jnp.any(eq, axis=-1)
    blk = jnp.take_along_axis(block_table, blk_idx, axis=1)  # (B,S)
    off = write_pos % bs
    if found is not None:
        blk = jnp.where(found, blk, 0)
    if valid is not None:
        blk = jnp.where(valid, blk, 0)

    int8_pool = layer_caches["k"].dtype in (jnp.int8, jnp.bfloat16) or \
        not quantized   # the write kernels quantize to int8 only
    if new_k.shape[1] == 1:
        from ..ops._util import kernel_enabled
        if use_kernels and int8_pool and kernel_enabled("MIXQ_WRITE_KERNEL"):
            # decode: aliased Pallas RMW of the one target page per seq.
            # A dynamic_update_slice next to the Pallas attention read of
            # the same scan-carried pool makes XLA copy-protect the WHOLE
            # pool every layer (alias analysis can't see through the custom
            # call): 1623 us/layer vs 360 with this kernel (probe_flatpool)
            if mesh is not None:
                from ..parallel import kernel_shard as kshard
                return kshard.write_token(mesh, layer_caches, blk[:, 0],
                                          off[:, 0], new_k[:, 0],
                                          new_v[:, 0])
            from ..ops.paged_write import paged_write_token
            return paged_write_token(layer_caches, blk[:, 0], off[:, 0],
                                     new_k[:, 0], new_v[:, 0])
        # CPU/fallback: per-sequence dynamic_update_slice chains (beat an
        # XLA scatter ~1.6x on TPU when they were the default)
        return _paged_write_decode(layer_caches, blk[:, 0], off[:, 0],
                                   new_k[:, 0], new_v[:, 0], quantized)
    from ..ops._util import kernel_enabled
    if (use_kernels and int8_pool and kernel_enabled("MIXQ_WRITE_KERNEL")
            and new_k.shape[1] <= 8):
        # small unaligned row chunks (speculative verify's gamma+1 rows):
        # one aliased token-write RMW per column. The XLA scatter below,
        # sitting next to the Pallas attention read of the same carried
        # pool, copy-protects the WHOLE pool (r3 on-chip: the in-graph
        # spec burst compiled at 18.5 GB vs 15.75 HBM purely from this) —
        # the chained aliased kernels keep it in one buffer.
        if mesh is not None:
            from ..parallel import kernel_shard as kshard
            for s_i in range(new_k.shape[1]):
                layer_caches = kshard.write_token(
                    mesh, layer_caches, blk[:, s_i], off[:, s_i],
                    new_k[:, s_i], new_v[:, s_i])
            return layer_caches
        from ..ops.paged_write import paged_write_token
        for s_i in range(new_k.shape[1]):
            layer_caches = paged_write_token(
                layer_caches, blk[:, s_i], off[:, s_i],
                new_k[:, s_i], new_v[:, s_i])
        return layer_caches
    if (use_kernels and int8_pool and kernel_enabled("MIXQ_WRITE_KERNEL")
            and new_k.shape[1] % bs == 0):
        # chunked prefill: aliased Pallas RMW of the pages each BS-token
        # slab lands in. The XLA scatter below, sitting next to the Pallas
        # prefill-attention read of the same scan-carried pool, made XLA
        # copy-protect the whole pool every layer — 748 ms per 4-lane
        # 256-token chunk at 7B (tools/probe_serving.py). Requires the
        # executor's page-aligned contiguous chunks (see paged_write_chunk).
        if mesh is not None:
            from ..parallel import kernel_shard as kshard
            return kshard.write_chunk(mesh, layer_caches, blk, off,
                                      new_k, new_v)
        from ..ops.paged_write import paged_write_chunk
        return paged_write_chunk(layer_caches, blk, off, new_k, new_v)
    # kv pages are (NB, Hkv, BS, D) and scale pages (NB, Hkv, BS): the
    # head axis precedes the in-block offset, so updates index [blk, :, off]
    if quantized:
        qk, sk = qcore.quantize_kv(new_k, dtype=layer_caches["k"].dtype)
        qv, sv = qcore.quantize_kv(new_v, dtype=layer_caches["v"].dtype)
        out = {
            "k": layer_caches["k"].at[blk, :, off].set(qk),
            "v": layer_caches["v"].at[blk, :, off].set(qv),
            "k_scale": layer_caches["k_scale"].at[blk, :, off].set(sk),
            "v_scale": layer_caches["v_scale"].at[blk, :, off].set(sv),
        }
    else:
        out = {
            "k": layer_caches["k"].at[blk, :, off].set(
                new_k.astype(layer_caches["k"].dtype)),
            "v": layer_caches["v"].at[blk, :, off].set(
                new_v.astype(layer_caches["v"].dtype)),
        }
    return out


def _paged_write_decode(layer_caches, blk, off, new_k, new_v, quantized):
    """Single-token writes: one dynamic_update_slice per sequence.

    blk/off: (B,) page id and in-page offset; new_k/new_v: (B, H, D).
    """
    b, h, d = new_k.shape

    def write_pool(pool, rows):
        def body(i, pool):
            upd = rows[i].astype(pool.dtype)[None, :, None, :]  # (1,H,1,D)
            return jax.lax.dynamic_update_slice(pool, upd,
                                                (blk[i], 0, off[i], 0))
        return jax.lax.fori_loop(0, b, body, pool)

    def write_scales(pool, rows):
        def body(i, pool):
            upd = rows[i].astype(pool.dtype)[None, :, None]      # (1,H,1)
            return jax.lax.dynamic_update_slice(pool, upd,
                                                (blk[i], 0, off[i]))
        return jax.lax.fori_loop(0, b, body, pool)

    if quantized:
        qk, sk = qcore.quantize_kv(new_k, dtype=layer_caches["k"].dtype)
        qv, sv = qcore.quantize_kv(new_v, dtype=layer_caches["v"].dtype)
        return {
            "k": write_pool(layer_caches["k"], qk),
            "v": write_pool(layer_caches["v"], qv),
            "k_scale": write_scales(layer_caches["k_scale"], sk),
            "v_scale": write_scales(layer_caches["v_scale"], sv),
        }
    return {
        "k": write_pool(layer_caches["k"], new_k),
        "v": write_pool(layer_caches["v"], new_v),
    }


GATHER_TRACES = [0]   # trace-time counter: tests assert the kernel data
#                       plane never routes through the materializing gather


def paged_gather(layer_caches, block_table: jax.Array, dtype):
    """Materialize (B, max_blocks*BS, H, D) kv views for attention (jnp
    reference path; the Pallas paged-attention kernel reads blocks in
    place instead)."""
    GATHER_TRACES[0] += 1
    k = layer_caches["k"][block_table]   # (B, MB, H, BS, D)
    v = layer_caches["v"][block_table]
    b, mb, h, bs, d = k.shape
    if "k_scale" in layer_caches:
        k = qcore.dequantize_kv(k, layer_caches["k_scale"][block_table],
                                dtype=dtype)
        v = qcore.dequantize_kv(v, layer_caches["v_scale"][block_table],
                                dtype=dtype)
    k = k.transpose(0, 1, 3, 2, 4).reshape(b, mb * bs, h, d)
    v = v.transpose(0, 1, 3, 2, 4).reshape(b, mb * bs, h, d)
    return k.astype(dtype), v.astype(dtype)
