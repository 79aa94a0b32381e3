"""Sort: multi-column, null-aware, padding-aware ordering.

Behavioral oracle: pyarrow.compute.sort_indices + take (SURVEY.md §2c,
BASELINE configs[2] — 64-bit keys + payload, nulls-first). TPU design: keys
normalize to order-preserving unsigned lanes (IEEE-754 total-order trick for
floats, sign-bias for ints, rank-inversion for descending), then one
``lax.sort`` — XLA's native multi-operand bitonic sort network — over
(padding-rank, null-rank, key…, row-index) produces a stable permutation
under fully static shapes. A Pallas radix path can slot in behind the same
interface for large-N speedups; the normalization contract is shared.

Stability matches Arrow: equal keys keep input order (lax.sort is_stable).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class SortKey(NamedTuple):
    values: jnp.ndarray
    validity: Optional[jnp.ndarray] = None
    ascending: bool = True
    nulls_first: bool = True


def _norm_f32(values):
    """float32 → uint32 whose unsigned order is IEEE total order (with
    Arrow-compatible equality classes: -0.0 == 0.0, all NaNs equal and
    sorted after +inf)."""
    values = jnp.where(values == 0.0, jnp.zeros_like(values), values)
    values = jnp.where(jnp.isnan(values), jnp.full_like(values, jnp.nan),
                       values)
    bits = values.view(jnp.uint32)
    sign = jnp.uint32(0x8000_0000)
    return jnp.where(bits & sign != 0, ~bits, bits | sign)


def normalize_key(values, ascending: bool = True):
    """Map a numeric/temporal column to unsigned lanes whose unsigned order
    equals the requested value order.

    No 64-bit bitcasts anywhere (unimplementable on TPU — utils/bits.py):
    int64 biases via arithmetic xor + wrap-astype; float64 normalizes as a
    double-float (hi, lo) pair packed into one uint64 with shifts (the pair
    is lexicographically value-ordered, so the packed integer is too)."""
    dt_ = values.dtype
    if dt_ == jnp.bool_:
        u = values.astype(jnp.uint32)
    elif dt_ == jnp.float32:
        u = _norm_f32(values)
    elif dt_ == jnp.float64:
        from ..utils.bits import _backend_has_true_f64

        values = jnp.where(values == 0.0, jnp.zeros_like(values), values)
        values = jnp.where(jnp.isnan(values), jnp.full_like(values, jnp.nan),
                           values)
        if _backend_has_true_f64():
            bits = values.view(jnp.uint64)
            sign = jnp.uint64(1) << jnp.uint64(63)
            u = jnp.where(bits & sign != 0, ~bits, bits | sign)
        else:
            hi = values.astype(jnp.float32)
            lo = (values - hi.astype(jnp.float64)).astype(jnp.float32)
            # (hi, lo) is value-lex-ordered for canonical double-floats
            u = ((_norm_f32(hi).astype(jnp.uint64) << jnp.uint64(32))
                 | _norm_f32(lo).astype(jnp.uint64))
    elif dt_ in (jnp.int8, jnp.int16, jnp.int32, jnp.int64):
        wide = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32,
                8: jnp.uint64}[dt_.itemsize]
        minval = -(1 << (dt_.itemsize * 8 - 1))
        u = (values ^ jnp.array(minval, dt_)).astype(wide)  # wrap: bias
    else:  # unsigned
        u = values
    if not ascending:
        u = ~u
    return u


def denormalize_key(u, dtype, ascending: bool = True):
    """Inverse of ``normalize_key`` — recover CANONICAL column values from
    normalized unsigned lanes (−0.0 and NaN were canonicalized on the way
    in, so those equality classes come back as their canonical member)."""
    if not ascending:
        u = ~u

    def inv_f32(bits_u32):
        sign = jnp.uint32(0x8000_0000)
        b = jnp.where(bits_u32 & sign != 0, bits_u32 ^ sign, ~bits_u32)
        return b.view(jnp.float32)

    if dtype == jnp.bool_:
        return u.astype(jnp.bool_)
    if dtype == jnp.float32:
        return inv_f32(u.astype(jnp.uint32))
    if dtype == jnp.float64:
        from ..utils.bits import _backend_has_true_f64

        if _backend_has_true_f64():
            sign = jnp.uint64(1) << jnp.uint64(63)
            b = jnp.where(u & sign != 0, u ^ sign, ~u)
            return b.view(jnp.float64)
        hi = inv_f32((u >> jnp.uint64(32)).astype(jnp.uint32))
        lo = inv_f32((u & jnp.uint64(0xFFFF_FFFF)).astype(jnp.uint32))
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)
    d = jnp.dtype(dtype)
    if d in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16),
             jnp.dtype(jnp.int32), jnp.dtype(jnp.int64)):
        minval = -(1 << (d.itemsize * 8 - 1))
        return u.astype(d) ^ jnp.array(minval, d)  # astype wraps: bits kept
    return u.astype(d)  # unsigned


def _build_operands(keys: Sequence[SortKey], length):
    """Lexicographic sort operands + the operand index of each key's norm."""
    n = keys[0].values.shape[0]
    operands = []
    key_opnd = []
    # leading rank: (padding << 1) | null-placement for the FIRST key —
    # both outrank the first key value in lexicographic priority. Skipped
    # entirely when statically all-zero (no padding, no nulls): a constant
    # operand costs a full comparator limb through every sort pass (r4)
    first = keys[0]
    norm0 = normalize_key(first.values, first.ascending)
    if length is not None or first.validity is not None:
        rank = jnp.zeros((n,), dtype=jnp.uint32)
        if length is not None:
            rank = rank | (jnp.arange(n) >= length).astype(jnp.uint32) << 1
        if first.validity is not None:
            # the group that must come first carries the smaller rank
            rank = rank | jnp.where(first.nulls_first,
                                    first.validity.astype(jnp.uint32),
                                    (~first.validity).astype(jnp.uint32))
            norm0 = jnp.where(first.validity, norm0, jnp.zeros_like(norm0))
        operands.append(rank)
    key_opnd.append(len(operands))
    operands.append(norm0)
    for k in keys[1:]:
        norm = normalize_key(k.values, k.ascending)
        if k.validity is not None:
            null_rank = k.validity if k.nulls_first \
                else jnp.logical_not(k.validity)
            operands.append(null_rank)
            norm = jnp.where(k.validity, norm, jnp.zeros_like(norm))
        key_opnd.append(len(operands))
        operands.append(norm)
    return operands, key_opnd


def _norms_from_limbs(sorted_limbs, spans, key_opnd, operands):
    from ..utils.bits import combine_i64

    sorted_norms = []
    for ki in key_opnd:
        start, cnt = spans[ki]
        if cnt == 2:
            sorted_norms.append(combine_i64(sorted_limbs[start + 1],
                                            sorted_limbs[start],
                                            jnp.uint64))
        else:
            sorted_norms.append(
                sorted_limbs[start].astype(operands[ki].dtype))
    return sorted_norms


def _sort_full(keys: Sequence[SortKey], length, carries=()):
    """(perm, sorted norm per key, sorted carries). Operand count is
    minimized aggressively — padding/null bits fold into one uint32 rank
    operand. ``carries`` are uint32 lane arrays that ride the permutation
    through the merge-path network (TPU large-N path only — callers must
    gather them via ``perm`` when the third result comes back empty)."""
    n = keys[0].values.shape[0]
    operands, key_opnd = _build_operands(keys, length)
    if _use_merge(n):
        from .kernels.merge_path import merge_sort_u32
        from .kernels.sort_bitonic import operands_to_limbs

        limbs, spans = operands_to_limbs(operands)
        perm, sorted_limbs, sorted_carries = merge_sort_u32(limbs, carries)
        return perm, _norms_from_limbs(sorted_limbs, spans, key_opnd,
                                       operands), sorted_carries
    idx = jnp.arange(n, dtype=jnp.int32)
    results = lax.sort(tuple(operands) + (idx,),
                       num_keys=len(operands), is_stable=True)
    return results[-1], [results[ki] for ki in key_opnd], ()


def sort_permutation(keys: Sequence[SortKey], length=None):
    """Return the stable permutation (int32 indices) ordering rows by the
    given keys; padding rows (index ≥ length) sort to the back."""
    perm, _, _ = _sort_full(keys, length)
    return perm


def _use_merge(n: int) -> bool:
    """lax.sort's bitonic lowering compiles pathologically at 8M+ rows and
    runs ~20 Mrows/s at 100M; the merge-path network
    (kernels/merge_path.py — leaf sort + log2(n/W) Pallas merge rounds) is
    ~6× faster than even the explicit hybrid bitonic network and carries
    payload limbs for free. Below ~64k rows the pallas_call fixed costs
    dominate and lax.sort is fine."""
    import jax

    return jax.default_backend() == "tpu" and n >= (1 << 16)


def sort_columns(keys: Sequence[SortKey],
                 payload: Sequence[jnp.ndarray] = (),
                 length=None):
    """Sort key columns plus payload columns; returns (perm, sorted key
    value arrays, sorted payloads).

    TPU large-N path: payloads (and nullable keys' original values, whose
    norms were null-zeroed) ride the merge-path sort as uint32 carry limbs
    — no post-sort gather at all (XLA gather costs ~12 ns/row on v5e, the
    old path's dominant cost). Non-null key VALUES reconstruct from the
    sorted norms (denormalize_key). Small-N/CPU path: 32-bit-limb gathers
    via the permutation (utils/bits.py), as before."""
    from ..utils.bits import (column_from_lanes, gather32,
                              lanes_from_column)

    n = keys[0].values.shape[0]
    if _use_merge(n):
        carries = []
        key_lane_counts = []
        for k in keys:
            if k.validity is not None:
                parts = lanes_from_column(k.values)
                key_lane_counts.append(len(parts))
                carries.extend(parts)
            else:
                key_lane_counts.append(0)
        payload_lane_counts = []
        for p in payload:
            parts = lanes_from_column(p)
            payload_lane_counts.append(len(parts))
            carries.extend(parts)
        perm, sorted_norms, sorted_carries = _sort_full(keys, length,
                                                        carries)
        pos = 0
        sorted_keys = []
        for k, sn, cnt in zip(keys, sorted_norms, key_lane_counts):
            if cnt:
                sorted_keys.append(column_from_lanes(
                    list(sorted_carries[pos:pos + cnt]), k.values.dtype))
                pos += cnt
            else:
                sorted_keys.append(denormalize_key(sn, k.values.dtype,
                                                   k.ascending))
        sorted_payload = []
        for p, cnt in zip(payload, payload_lane_counts):
            sorted_payload.append(column_from_lanes(
                list(sorted_carries[pos:pos + cnt]), p.dtype))
            pos += cnt
        return perm, sorted_keys, sorted_payload

    perm, sorted_norms, _ = _sort_full(keys, length=length)
    sorted_keys = []
    for k, sn in zip(keys, sorted_norms):
        if k.validity is not None:
            sorted_keys.append(gather32(k.values, perm))
        else:
            sorted_keys.append(denormalize_key(sn, k.values.dtype,
                                               k.ascending))
    sorted_payload = [gather32(p, perm) for p in payload]
    return perm, sorted_keys, sorted_payload
