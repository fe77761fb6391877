"""ctypes bindings for the native block-manager core (native/mixq_native.cpp).

The shared library is built on demand with g++ (cached next to the source);
if the toolchain or binary is unavailable the pure-Python BlockManager in
kv_cache.py is used instead — both implement the same contract and are
cross-tested.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "mixq_native.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libmixq_native.so"))

_lib = None
_lib_lock = threading.Lock()


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
        check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SRC):
            raise NativeUnavailable(f"source not found: {_SRC}")
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            try:
                _build()
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                raise NativeUnavailable(f"native build failed: {e}") from e
        lib = ctypes.CDLL(_SO)
        lib.mixq_bm_create.restype = ctypes.c_int64
        lib.mixq_bm_create.argtypes = [ctypes.c_int32] * 4
        lib.mixq_bm_destroy.argtypes = [ctypes.c_int64]
        lib.mixq_bm_num_free.restype = ctypes.c_int32
        lib.mixq_bm_num_free.argtypes = [ctypes.c_int64]
        lib.mixq_bm_prefix_cache_size.restype = ctypes.c_int32
        lib.mixq_bm_prefix_cache_size.argtypes = [ctypes.c_int64]
        lib.mixq_bm_can_allocate.restype = ctypes.c_int32
        lib.mixq_bm_can_allocate.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.mixq_bm_add_sequence.restype = ctypes.c_int32
        lib.mixq_bm_add_sequence.argtypes = [ctypes.c_int64] * 3
        lib.mixq_bm_extend.restype = ctypes.c_int32
        lib.mixq_bm_extend.argtypes = [ctypes.c_int64] * 3
        lib.mixq_bm_free_sequence.restype = ctypes.c_int32
        lib.mixq_bm_free_sequence.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.mixq_bm_rewind.restype = ctypes.c_int32
        lib.mixq_bm_rewind.argtypes = [ctypes.c_int64] * 3
        lib.mixq_bm_add_sequence_cached.restype = ctypes.c_int32
        lib.mixq_bm_add_sequence_cached.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.mixq_bm_register_prefix.restype = ctypes.c_int32
        lib.mixq_bm_register_prefix.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.mixq_bm_fork.restype = ctypes.c_int32
        lib.mixq_bm_fork.argtypes = [ctypes.c_int64] * 3
        lib.mixq_bm_block_table.restype = ctypes.c_int32
        lib.mixq_bm_block_table.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.mixq_bm_block_tables.restype = ctypes.c_int32
        lib.mixq_bm_block_tables.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.mixq_bm_block_poss.restype = ctypes.c_int32
        lib.mixq_bm_block_poss.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.mixq_bm_seq_length.restype = ctypes.c_int64
        lib.mixq_bm_seq_length.argtypes = [ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return _lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


_ERR = {-1: "unknown handle", -2: "unknown sequence", -3: "pool exhausted",
        -4: "sequence exists", -5: "table overflow",
        -7: "rewind unsupported with windows", -8: "bad rewind length"}


def _check(code: int, op: str) -> None:
    if code < 0:
        msg = _ERR.get(code, f"error {code}")
        if code == -3:
            raise RuntimeError(f"KV pool exhausted ({op})")
        raise RuntimeError(f"native block manager {op}: {msg}")


class NativeBlockManager:
    """Drop-in replacement for kv_cache.BlockManager backed by C++."""

    def __init__(self, num_blocks: int, block_size: int,
                 sink_blocks: int = 0, window_blocks: Optional[int] = None):
        self._lib = load_library()
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.window_blocks = window_blocks
        self._h = self._lib.mixq_bm_create(
            num_blocks, block_size, sink_blocks,
            -1 if window_blocks is None else window_blocks)

    def __del__(self):
        try:
            self._lib.mixq_bm_destroy(self._h)
        except Exception:
            pass

    def blocks_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.block_size)

    def can_allocate(self, num_tokens: int) -> bool:
        return bool(self._lib.mixq_bm_can_allocate(self._h, num_tokens))

    def add_sequence(self, seq_id: int, num_tokens: int) -> None:
        code = self._lib.mixq_bm_add_sequence(self._h, seq_id, num_tokens)
        if code == -3:
            raise RuntimeError(
                f"KV pool exhausted: need "
                f"{self.blocks_needed(max(num_tokens, 1))} blocks, have "
                f"{self.num_free}")
        if code == -2:
            raise AssertionError(f"sequence {seq_id} already active")
        _check(code, "add_sequence")

    def extend(self, seq_id: int, new_tokens: int = 1) -> None:
        code = self._lib.mixq_bm_extend(self._h, seq_id, new_tokens)
        if code == -3:
            raise RuntimeError("KV pool exhausted during decode")
        _check(code, "extend")

    def add_sequence_cached(self, seq_id: int, tokens) -> tuple:
        """Adopt cached full-prefix blocks matching `tokens` (reference
        enableBlockReuse). Returns (None, cached_token_count) — callers
        only consume the count; block tables come from block_table()."""
        arr = np.ascontiguousarray(np.asarray(tokens, np.int64))
        code = self._lib.mixq_bm_add_sequence_cached(
            self._h, seq_id,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(arr))
        if code == -3:
            raise RuntimeError("KV pool exhausted (add_sequence_cached)")
        _check(code, "add_sequence_cached")
        return None, int(code)

    def register_prefix(self, seq_id: int, tokens, upto: int) -> None:
        arr = np.ascontiguousarray(np.asarray(tokens, np.int64))
        _check(self._lib.mixq_bm_register_prefix(
            self._h, seq_id,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            min(upto, len(arr))), "register_prefix")

    @property
    def prefix_cache_size(self) -> int:
        return int(self._lib.mixq_bm_prefix_cache_size(self._h))

    def rewind(self, seq_id: int, new_length: int) -> None:
        """Shrink to new_length tokens, freeing tail blocks beyond it
        (draft-token rewind; reference KVCacheUpdater)."""
        _check(self._lib.mixq_bm_rewind(self._h, seq_id, new_length),
               "rewind")

    def free_sequence(self, seq_id: int) -> None:
        _check(self._lib.mixq_bm_free_sequence(self._h, seq_id),
               "free_sequence")

    def fork(self, src_seq_id: int, dst_seq_id: int) -> None:
        _check(self._lib.mixq_bm_fork(self._h, src_seq_id, dst_seq_id),
               "fork")

    def seq_length(self, seq_id: int) -> int:
        n = self._lib.mixq_bm_seq_length(self._h, seq_id)
        _check(n if n < 0 else 0, "seq_length")
        return int(n)

    def block_table(self, seq_ids: List[int], max_blocks: int) -> np.ndarray:
        n = len(seq_ids)
        out = np.zeros((n, max_blocks), np.int32)
        ids = np.asarray(seq_ids, np.int64)
        code = self._lib.mixq_bm_block_tables(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_blocks)
        _check(code, "block_table")
        return out

    def block_pos(self, seq_ids: List[int], max_blocks: int) -> np.ndarray:
        n = len(seq_ids)
        out = np.zeros((n, max_blocks), np.int32)
        ids = np.asarray(seq_ids, np.int64)
        code = self._lib.mixq_bm_block_poss(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_blocks)
        _check(code, "block_pos")
        return out

    @property
    def num_free(self) -> int:
        return self._lib.mixq_bm_num_free(self._h)


def make_block_manager(num_blocks: int, block_size: int,
                       sink_blocks: int = 0,
                       window_blocks: Optional[int] = None,
                       prefer_native: bool = True):
    """Factory: native if buildable, else the Python implementation."""
    if prefer_native and native_available():
        return NativeBlockManager(num_blocks, block_size, sink_blocks,
                                  window_blocks)
    from .kv_cache import BlockManager
    return BlockManager(num_blocks, block_size, sink_blocks, window_blocks)
