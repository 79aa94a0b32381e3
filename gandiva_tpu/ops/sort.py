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


def sort_permutation(keys: Sequence[SortKey], length=None):
    """Return the stable permutation (int32 indices) ordering rows by the
    given keys; padding rows (index ≥ length) sort to the back.

    Operand count is minimized aggressively: the bitonic network XLA emits
    doubles per operand, and at 8M+ rows a 4-operand int64 sort failed to
    compile in 20+ minutes on this toolchain while (rank, key, idx) compiles
    in ~6 and runs 8M rows in ~400 ms. Padding/null bits fold into one
    uint32 rank operand; payloads are *gathered* by the permutation
    afterwards (sort_columns), never sorted along.
    """
    n = keys[0].values.shape[0]
    operands = []
    # leading rank: (padding << 1) | null-placement for the FIRST key —
    # both outrank the first key value in lexicographic priority
    first = keys[0]
    rank = jnp.zeros((n,), dtype=jnp.uint32)
    if length is not None:
        rank = rank | (jnp.arange(n) >= length).astype(jnp.uint32) << 1
    norm0 = normalize_key(first.values, first.ascending)
    if first.validity is not None:
        # encode so the group that must come first carries the smaller rank
        rank = rank | jnp.where(first.nulls_first,
                                first.validity.astype(jnp.uint32),
                                (~first.validity).astype(jnp.uint32))
        norm0 = jnp.where(first.validity, norm0, jnp.zeros_like(norm0))
    operands.append(rank)
    operands.append(norm0)
    for k in keys[1:]:
        norm = normalize_key(k.values, k.ascending)
        if k.validity is not None:
            null_rank = k.validity if k.nulls_first \
                else jnp.logical_not(k.validity)
            operands.append(null_rank)
            norm = jnp.where(k.validity, norm, jnp.zeros_like(norm))
        operands.append(norm)
    idx = jnp.arange(n, dtype=jnp.int32)
    results = lax.sort(tuple(operands) + (idx,),
                       num_keys=len(operands), is_stable=True)
    return results[-1]


def sort_columns(keys: Sequence[SortKey],
                 payload: Sequence[jnp.ndarray] = (),
                 length=None):
    """Sort key columns plus payload columns; returns (perm, sorted key
    value arrays, sorted payloads). Payloads move via 32-bit-limb gathers
    (utils/bits.py), never as extra sort operands."""
    from ..utils.bits import gather32

    perm = sort_permutation(keys, length=length)
    sorted_keys = [gather32(k.values, perm) for k in keys]
    sorted_payload = [gather32(p, perm) for p in payload]
    return perm, sorted_keys, sorted_payload
