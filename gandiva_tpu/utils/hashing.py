"""Vectorized hash kernels.

TPU-native counterpart of Gandiva's precompiled/hash.cc (murmur-family
hash32/hash64 with chainable seeds, SURVEY.md §2b "Hash") — used both as
registry functions and as the engine's partitioning/join/group-by hash.

TPU v5e prefers 32-bit lanes (SURVEY.md §7 hard parts: 64-bit hashing should
operate on (hi32, lo32) pairs), so the core primitive is the murmur3 fmix32
avalanche on uint32, and 64-bit values hash as two mixed 32-bit halves.
Hash *values* are engine-defined (the reference's exact outputs are not
verifiable offline); what the engine guarantees is the reference's *contract*:
deterministic, seed-chainable for multi-column hashing, and uniform enough to
partition skewed key sets.
"""
from __future__ import annotations

import jax.numpy as jnp

_C1 = jnp.uint32(0x85EB_CA6B)
_C2 = jnp.uint32(0xC2B2_AE35)
_GOLDEN = jnp.uint32(0x9E37_79B9)


def fmix32(h):
    """murmur3 finalizer — full 32-bit avalanche."""
    h = jnp.asarray(h, dtype=jnp.uint32)
    h = h ^ (h >> 16)
    h = h * _C1
    h = h ^ (h >> 13)
    h = h * _C2
    h = h ^ (h >> 16)
    return h


def _combine(seed, v):
    """boost-style hash_combine on uint32 lanes."""
    seed = jnp.asarray(seed, dtype=jnp.uint32)
    return seed ^ (fmix32(v) + _GOLDEN + (seed << 6) + (seed >> 2))


def hash32(x, seed=jnp.uint32(0)):
    """Hash any integer/float column to uint32, chainable via ``seed``.

    64-bit inputs are split into (hi, lo) 32-bit halves so the whole pipeline
    stays in native TPU lanes; floats hash by bit pattern with -0.0
    normalized to +0.0 (SQL equality semantics).
    """
    from .bits import split_f64, split_i64

    dt = x.dtype
    if dt == jnp.bool_:
        return _combine(seed, x.astype(jnp.uint32))
    if dt == jnp.float32:
        x = jnp.where(x == 0.0, jnp.zeros_like(x), x)  # -0.0 → +0.0
        return _combine(seed, x.view(jnp.uint32))
    if dt == jnp.float64:
        x = jnp.where(x == 0.0, jnp.zeros_like(x), x)
        a, b = split_f64(x)  # platform-exact 32-bit parts (utils/bits.py)
        a = a if a.dtype == jnp.uint32 else a.view(jnp.uint32)
        b = b if b.dtype == jnp.uint32 else b.view(jnp.uint32)
        return _combine(_combine(seed, a), b)
    if dt in (jnp.int64, jnp.uint64):
        lo, hi = split_i64(x)
        return _combine(_combine(seed, lo), hi)
    # ≤32-bit ints: widen preserving two's-complement bit pattern
    u = x.astype(jnp.int32).astype(jnp.uint32) \
        if dt in (jnp.int8, jnp.int16, jnp.int32) else x.astype(jnp.uint32)
    return _combine(seed, u)


def hash64(x, seed=jnp.uint64(0)):
    """64-bit hash assembled from two independent 32-bit passes."""
    s = jnp.asarray(seed, dtype=jnp.uint64)
    lo = hash32(x, (s & jnp.uint64(0xFFFF_FFFF)).astype(jnp.uint32))
    hi = hash32(x, (s >> jnp.uint64(32)).astype(jnp.uint32) ^ jnp.uint32(0xDEAD_BEEF))
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def partition_of(keys, num_partitions: int, seed=jnp.uint32(0)):
    """Partition id in [0, num_partitions) for each key — the engine-wide
    partitioning function (tables co-partition iff they use the same seed)."""
    return (hash32(keys, seed) % jnp.uint32(num_partitions)).astype(jnp.int32)
