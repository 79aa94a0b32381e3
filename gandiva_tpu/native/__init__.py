"""Native host runtime loader (ctypes over the C ABI in host_runtime.cpp).

Builds the shared library on first import if missing (g++ is part of the
toolchain in supported environments); every entry point has a pure-python
fallback so the engine works without a compiler. ``available()`` reports
which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_runtime.cpp")
_SO = os.path.join(_DIR, f"libgandiva_tpu_host_{sys.implementation.cache_tag}.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _SO if os.path.exists(_SO) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        # signatures
        lib.gt_pool_create.restype = ctypes.c_void_p
        lib.gt_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.gt_pool_alloc.restype = ctypes.c_void_p
        lib.gt_pool_alloc.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int64]
        lib.gt_pool_free.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_int64]
        for f in ("gt_pool_bytes_allocated", "gt_pool_peak_bytes",
                  "gt_pool_num_allocs"):
            getattr(lib, f).restype = ctypes.c_int64
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
        u64p = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
        lib.gt_unpack_bitmap.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_int64, u8p]
        lib.gt_pack_bitmap.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.gt_like_match_many.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_uint8, ctypes.c_int32, u8p]
        lib.gt_ilike_match_many.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int64, u8p]
        lib.gt_hash_bytes_many.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int64, ctypes.c_uint64, u64p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# typed wrappers (each with a python fallback)
# ---------------------------------------------------------------------------

class MemoryPool:
    """Aligned host allocator with live/peak accounting — the
    arrow::MemoryPool analogue (reference passes one to every Evaluate,
    libgandiva.pxd:219). Python-side buffers are numpy views over pool
    memory; freeing returns them to the OS and updates counters."""

    def __init__(self):
        lib = load()
        self._lib = lib
        self._handle = lib.gt_pool_create() if lib else None
        self._fallback_live = 0
        self._fallback_peak = 0
        self._fallback_count = 0
        self._allocs = {}

    def allocate(self, size: int, alignment: int = 64) -> np.ndarray:
        if self._handle:
            ptr = self._lib.gt_pool_alloc(self._handle, size, alignment)
            if not ptr:
                raise MemoryError(f"pool allocation of {size} bytes failed")
            buf = (ctypes.c_uint8 * size).from_address(ptr)
            arr = np.frombuffer(buf, dtype=np.uint8, count=size)
            self._allocs[arr.ctypes.data] = (ptr, size, alignment)
            return arr
        arr = np.zeros(size, dtype=np.uint8)
        self._fallback_live += size
        self._fallback_count += 1
        self._fallback_peak = max(self._fallback_peak, self._fallback_live)
        self._allocs[arr.ctypes.data] = (None, size, alignment)
        return arr

    def free(self, arr: np.ndarray):
        key = arr.ctypes.data
        rec = self._allocs.pop(key, None)
        if rec is None:
            return
        ptr, size, alignment = rec
        if ptr is not None and self._handle:
            self._lib.gt_pool_free(self._handle, ptr, size, alignment)
        else:
            self._fallback_live -= size

    @property
    def bytes_allocated(self) -> int:
        if self._handle:
            return self._lib.gt_pool_bytes_allocated(self._handle)
        return self._fallback_live

    @property
    def peak_bytes(self) -> int:
        if self._handle:
            return self._lib.gt_pool_peak_bytes(self._handle)
        return self._fallback_peak

    @property
    def num_allocations(self) -> int:
        if self._handle:
            return self._lib.gt_pool_num_allocs(self._handle)
        return self._fallback_count

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.gt_pool_destroy(self._handle)
            self._handle = None


_default_pool: Optional[MemoryPool] = None


def default_pool() -> MemoryPool:
    global _default_pool
    if _default_pool is None:
        _default_pool = MemoryPool()
    return _default_pool


def unpack_bitmap(bits_buffer, bit_offset: int, n: int) -> np.ndarray:
    """Arrow packed validity bits → bool byte mask."""
    out = np.empty(n, dtype=np.uint8)
    lib = load()
    if lib is not None:
        addr = 0 if bits_buffer is None else bits_buffer.address
        lib.gt_unpack_bitmap(ctypes.c_void_p(addr or None), bit_offset, n,
                             out)
        return out.view(bool)
    if bits_buffer is None:
        out[:] = 1
        return out.view(bool)
    raw = np.frombuffer(bits_buffer, dtype=np.uint8)
    bits = np.unpackbits(raw, bitorder="little")
    return bits[bit_offset:bit_offset + n].astype(bool)


def pack_bitmap(bools: np.ndarray) -> np.ndarray:
    n = len(bools)
    out = np.zeros((n + 7) // 8, dtype=np.uint8)
    lib = load()
    b = np.ascontiguousarray(bools, dtype=np.uint8)
    if lib is not None:
        lib.gt_pack_bitmap(b, n, out)
        return out
    return np.packbits(b, bitorder="little")


def _string_view(arrow_array):
    """(values_address, offsets int32 array, n) for a pyarrow string array
    with zero copies; returns None if the layout is not plain utf8."""
    import pyarrow as pa

    if not (pa.types.is_string(arrow_array.type)):
        return None
    if arrow_array.null_count:
        arrow_array = arrow_array.fill_null("")
    bufs = arrow_array.buffers()
    if len(bufs) < 3 or bufs[1] is None:
        return None
    offsets = np.frombuffer(bufs[1], dtype=np.int32,
                            count=len(arrow_array) + 1 + arrow_array.offset)
    offsets = np.ascontiguousarray(offsets[arrow_array.offset:])
    values_addr = bufs[2].address if bufs[2] is not None else 0
    return values_addr, offsets, len(arrow_array)


def like_match(arrow_strings, pattern: str, escape: Optional[str] = None,
               ignore_case: bool = False) -> Optional[np.ndarray]:
    """Native SQL LIKE over a pyarrow string array; None → caller falls back
    to the python regex path."""
    lib = load()
    if lib is None:
        return None
    view = _string_view(arrow_strings)
    if view is None:
        return None
    addr, offsets, n = view
    out = np.empty(n, dtype=np.uint8)
    pat = pattern.encode()
    if ignore_case:
        lib.gt_ilike_match_many(ctypes.c_void_p(addr or None), offsets, n,
                                pat, len(pat), out)
    else:
        esc = (escape or "\\").encode()[0] if escape else 0
        lib.gt_like_match_many(ctypes.c_void_p(addr or None), offsets, n,
                               pat, len(pat), esc,
                               1 if escape else 0, out)
    return out.view(bool)


def hash_bytes(arrow_strings, seed: int = 0) -> Optional[np.ndarray]:
    """Native FNV-1a-64 over a pyarrow string array (bit-identical to
    string_ops.hash_bytes_np); None → python fallback."""
    lib = load()
    if lib is None:
        return None
    view = _string_view(arrow_strings)
    if view is None:
        return None
    addr, offsets, n = view
    out = np.empty(n, dtype=np.uint64)
    lib.gt_hash_bytes_many(ctypes.c_void_p(addr or None), offsets, n,
                           np.uint64(seed), out)
    return out
