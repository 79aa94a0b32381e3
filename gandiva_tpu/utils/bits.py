"""32-bit lane discipline for random-access ops.

Two measured facts about TPU v5e drive this module
(bench_reference/prof_ops.py + compile probes):

1. XLA scatter/gather of 64-bit elements is 4-25× slower than 32-bit (f64
   scatter 2073 ms vs f32 82 ms at 16M rows) — 64-bit lanes are emulated as
   32-bit pairs.
2. 64-bit *bitcasts* are unimplementable on TPU: the X64 rewriter errors on
   ``bitcast-convert u64`` — and float64 is physically a double-float
   (f32 hi, f32 lo) pair, so f64 "bits" don't even exist on device.

Engine-wide rules:
- integers split into uint32 limbs with arithmetic (&, >>, astype-wrap) —
  never ``.view`` on a 64-bit dtype;
- float64 splits as (hi = f32(x), lo = f32(x - hi)) — the exact double-float
  decomposition the hardware already uses; recombination hi+lo is exact;
- any gather/scatter/sort-payload of a 64-bit column moves as two 32-bit
  limb columns and recombines after (SURVEY.md §7 hard parts).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

_MASK32 = 0xFFFF_FFFF


def is64(dtype) -> bool:
    return jnp.dtype(dtype) in (jnp.dtype(jnp.int64), jnp.dtype(jnp.uint64),
                                jnp.dtype(jnp.float64))


def split_i64(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int64/uint64 → (lo, hi) uint32 limbs, arithmetic only."""
    if x.dtype == jnp.int64:
        lo = (x & jnp.int64(_MASK32)).astype(jnp.uint32)
        hi = ((x >> 32) & jnp.int64(_MASK32)).astype(jnp.uint32)
    else:
        lo = (x & jnp.uint64(_MASK32)).astype(jnp.uint32)
        hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    return lo, hi


def combine_i64(lo, hi, dtype):
    u = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return u.astype(dtype)  # astype wraps: bit pattern preserved


def _backend_has_true_f64() -> bool:
    """CPU holds real binary64 (64-bit views are exact and supported); TPU
    emulates f64 as a double-float pair and cannot bitcast 64-bit types."""
    import jax

    return jax.default_backend() == "cpu"


def split_f64(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """float64 → two 32-bit lane arrays, exactly invertible per platform.

    TPU: the (hi=f32(x), lo=f32(x-hi)) double-float pair — exact because
    that IS the device representation. CPU: uint32 bit limbs — exact for
    true binary64 (the double-float split would drop mantissa bits 49-53
    there)."""
    if _backend_has_true_f64():
        return split_i64(x.view(jnp.uint64))
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def combine_f64(a, b):
    """Invert split_f64 (positional: pass the two parts in split order)."""
    if a.dtype == jnp.uint32:  # CPU bit-limb path: (lo, hi)
        return combine_i64(a, b, jnp.uint64).view(jnp.float64)
    return a.astype(jnp.float64) + b.astype(jnp.float64)  # TPU: (hi, lo)


def explode(x) -> List[jnp.ndarray]:
    """Column → list of ≤32-bit lane arrays for random-access transport."""
    d = x.dtype
    if d == jnp.float64:
        return list(split_f64(x))
    if d in (jnp.int64, jnp.uint64):
        return list(split_i64(x))
    return [x]


def rebuild(parts: List[jnp.ndarray], dtype):
    d = jnp.dtype(dtype)
    if len(parts) == 2:
        if d == jnp.dtype(jnp.float64):
            return combine_f64(parts[0], parts[1])
        return combine_i64(parts[0], parts[1], dtype)
    p = parts[0]
    return p if p.dtype == d else p.astype(d)


def lanes_from_column(x) -> List[jnp.ndarray]:
    """Column → uint32 lane arrays for bit-exact transport through sort /
    compaction kernels (inverse: column_from_lanes)."""
    parts = explode(x)
    out = []
    for p in parts:
        d = p.dtype
        if d == jnp.float32:
            out.append(p.view(jnp.uint32))
        elif d == jnp.uint32:
            out.append(p)
        elif d in (jnp.uint8, jnp.uint16):
            out.append(p.astype(jnp.uint32))
        elif d in (jnp.int8, jnp.int16, jnp.int32, jnp.bool_):
            out.append(p.astype(jnp.int32).view(jnp.uint32))
        else:
            out.append(p.view(jnp.uint32))
    return out


def column_from_lanes(parts: List[jnp.ndarray], dtype):
    """Inverse of lanes_from_column."""
    d = jnp.dtype(dtype)
    if len(parts) == 2:
        if d == jnp.dtype(jnp.float64):
            if not _backend_has_true_f64():
                parts = [p.view(jnp.float32) for p in parts]
            return combine_f64(parts[0], parts[1])
        return combine_i64(parts[0], parts[1], dtype)
    p = parts[0]
    if d == jnp.dtype(jnp.float32):
        return p.view(jnp.float32)
    if d == jnp.dtype(jnp.bool_):
        return p.view(jnp.int32).astype(jnp.bool_)
    if d in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16),
             jnp.dtype(jnp.int32)):
        return p.view(jnp.int32).astype(d)
    if d in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.uint16)):
        return p.astype(d)
    return p.view(d)


def gather32(values, idx):
    """values[idx] with 64-bit payloads moved as 32-bit limb pairs."""
    if is64(values.dtype):
        parts = explode(values)
        return rebuild([p[idx] for p in parts], values.dtype)
    return values[idx]


def scatter32_set(target, idx, values, mode="drop"):
    """target.at[idx].set(values) with 64-bit payloads as limb pairs."""
    if is64(values.dtype):
        tparts = explode(target)
        vparts = explode(values)
        out = [t.at[idx].set(v, mode=mode) for t, v in zip(tparts, vparts)]
        return rebuild(out, values.dtype)
    return target.at[idx].set(values, mode=mode)
