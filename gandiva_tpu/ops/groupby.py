"""Group-id assignment: exact distinct-key discovery on device.

The reference has no aggregate operator (SURVEY.md §2c) — behavior is pinned
by the Acero oracle. The TPU problem is assigning each row a dense group id
without data-dependent shapes. Design: an open-addressing hash table built
with iterated scatter/gather rounds (XLA has no CAS; last-writer-wins scatter
+ re-read converges because a slot, once settled, only ever matches or
deflects):

  round i: unresolved rows probe slot (h(key)+i) mod T;
           rows whose slot is unoccupied scatter their key (one winner);
           every unresolved row re-reads: if the slot now holds its key it
           resolves to that slot; otherwise it advances to probe i+1.

Occupancy is a separate bool table, so no key value is sacrificed as a
sentinel. With T ≥ 4×G the expected round count is ~1-2; the while_loop is
bounded by the table size. Outputs are dense slot-rank group ids plus the
unique-key table and group count — everything downstream (one-hot
aggregation, sorting of groups) stays static-shape.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.hashing import hash32


def table_size_for(max_groups: int, table_factor: int = 4) -> int:
    T = 1
    while T < max_groups * table_factor:
        T *= 2
    return T


def key_to_i64(keys):
    """Any key column → int64 with an equality-preserving bijection.

    astype would TRUNCATE floats (1.5 and 1.7 would both become key 1);
    float columns map through sort's normalize_key (pure arithmetic, TPU-
    safe, -0.0/NaN canonicalized to SQL equality classes) and wrap-convert.
    """
    if keys.dtype in (jnp.float32, jnp.float64):
        from .sort import normalize_key

        return normalize_key(keys).astype(jnp.int64)
    if keys.dtype == jnp.uint64:
        return keys.astype(jnp.int64)  # wrap: bit pattern preserved
    return keys.astype(jnp.int64)


def group_ids(keys, valid=None, max_groups: int = 4096,
              table_factor: int = 4):
    """Assign dense group ids to ``keys``.

    Returns (gid[N] int32, unique_keys[T] int64, group_count, overflow):
    - gid ∈ [0, group_count) for valid rows; T for invalid rows
    - unique_keys: distinct keys compacted to rank order (tail undefined;
      for float inputs these are normalize_key images, not raw values —
      gather the original column by a representative row to recover them)
    - overflow: distinct keys exceeded the probe budget — caller retries
      with a larger ``max_groups`` (Status-style error, SURVEY.md §5.3)
    """
    n = keys.shape[0]
    T = table_size_for(max_groups, table_factor)
    keys = key_to_i64(keys)
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    table_key = jnp.zeros((T + 1,), dtype=jnp.int64)
    table_occ = jnp.zeros((T + 1,), dtype=bool)
    h0 = (hash32(keys) % jnp.uint32(T)).astype(jnp.int32)
    # double hashing: odd stride (full cycle in the power-of-2 table) —
    # each while_loop round is a full pass over every row, and linear
    # probing's clusters make the MAX chain the cost driver
    step = ((hash32(keys, jnp.uint32(0x9E37)) % jnp.uint32(T))
            | jnp.uint32(1)).astype(jnp.int32)

    def cond(state):
        i, _, _, _, unresolved, _ = state
        return jnp.logical_and(i < T, unresolved.any())

    def body(state):
        i, pos, table_key, table_occ, unresolved, slot_of = state
        slot = jnp.where(unresolved, pos, T)    # parked rows write the dump
        # claim unoccupied slots (last writer wins; occupancy write is
        # value-identical for all writers so the pair stays consistent)
        claim = unresolved & ~table_occ[slot]
        claim_slot = jnp.where(claim, slot, T)
        table_key = table_key.at[claim_slot].set(keys, mode="drop")
        table_occ = table_occ.at[claim_slot].set(True, mode="drop")
        # re-read: settled if the slot now holds my key
        settled = unresolved & table_occ[slot] & (table_key[slot] == keys)
        slot_of = jnp.where(settled, slot, slot_of)
        return (i + 1, (pos + step) % T, table_key, table_occ,
                unresolved & ~settled, slot_of)

    init = (jnp.int32(0), h0, table_key, table_occ, valid,
            jnp.full((n,), T, dtype=jnp.int32))
    try:
        _, _, table_key, table_occ, unresolved, slot_of = lax.while_loop(
            cond, body, init)
    except TypeError:
        # under shard_map the fresh table constants are axis-unvarying while
        # the loop outputs vary over the partition axis; promote the carry
        axes = set(jax.typeof(keys).vma)  # varying manual axes

        def _pv(x):
            need = axes - set(jax.typeof(x).vma)
            if not need:
                return x
            try:
                return lax.pcast(x, tuple(need), to="varying")
            except (AttributeError, TypeError):
                return lax.pvary(x, tuple(need))

        init = tuple(_pv(x) for x in init)
        _, _, table_key, table_occ, unresolved, slot_of = lax.while_loop(
            cond, body, init)
    overflow = unresolved.any()

    filled = table_occ[:T]
    rank = jnp.cumsum(filled, dtype=jnp.int32) - filled.astype(jnp.int32)
    group_count = jnp.sum(filled.astype(jnp.int32))
    gid = jnp.where(slot_of < T, rank[jnp.clip(slot_of, 0, T - 1)], T)
    gid = jnp.where(valid, gid, T).astype(jnp.int32)

    uniq = jnp.zeros((T + 1,), dtype=jnp.int64).at[
        jnp.where(filled, rank, T)].set(table_key[:T], mode="drop")[:T]
    return gid, uniq, group_count, overflow


def group_ids_multi(key_columns, valids=None, max_groups: int = 4096,
                    table_factor: int = 4):
    """Composite-key group ids, exact for any number of key columns.

    Cascade construction: resolve each column to its own dense id, then
    combine pairwise as ``gid_a * (max_groups+2) + gid_b`` — equal combined
    ids ⟺ equal key tuples (both factors are dense per-column ids), and the
    combined domain re-resolves through the same hash table. Null keys get
    their own id per column (SQL GROUP BY groups nulls together).

    Returns (gid[N], group_count, overflow). Unique *tuples* are recoverable
    by gathering each key column at one representative row per group.
    """
    n = key_columns[0].shape[0]
    if valids is None:
        valids = [None] * len(key_columns)
    base = jnp.int64(max_groups + 2)

    combined = None
    overflow = jnp.array(False)
    for col, valid in zip(key_columns, valids):
        gid, _, _, ov = group_ids(col, None, max_groups=max_groups,
                                  table_factor=table_factor)
        overflow = overflow | ov
        # null keys form their own per-column id (max_groups+1)
        if valid is not None:
            gid = jnp.where(valid, gid, jnp.int32(max_groups + 1))
        g64 = gid.astype(jnp.int64)
        combined = g64 if combined is None else combined * base + g64
        if combined is not None and col is not key_columns[-1]:
            # re-densify between stages so the product stays in range
            combined, _, _, ov2 = group_ids(combined, None,
                                            max_groups=max_groups,
                                            table_factor=table_factor)
            overflow = overflow | ov2
            combined = combined.astype(jnp.int64)

    gid, _, gcount, ov3 = group_ids(combined, None, max_groups=max_groups,
                                    table_factor=table_factor)
    return gid, gcount, overflow | ov3


def distinct_small(keys, valid=None, max_groups: int = 256):
    """Distinct keys + dense gids for LOW-cardinality columns without any
    scatter: iterative min-extraction.

    The scatter/gather hash table costs seconds at 100M rows on TPU (64-bit
    scatter is the pathological op — utils/bits.py); this path instead runs
    ``max_groups`` rounds of a pure masked min-reduction (HBM-bandwidth
    bound, ~0.5 ms/round at 16M rows), then assigns gids with one
    broadcast-compare against the distinct table. Exact; group order is
    ascending by normalized key. Returns (gid, uniq_i64, count, overflow) —
    same contract as group_ids.
    """
    n = keys.shape[0]
    k64 = key_to_i64(keys)
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    BIG = jnp.int64(2 ** 63 - 1)
    masked = jnp.where(valid, k64, BIG)
    has_max_key = jnp.any(valid & (k64 == BIG))

    def body(prev, _):
        nxt = jnp.min(jnp.where(masked > prev, masked, BIG))
        return nxt, nxt

    init = jnp.int64(-2 ** 63)
    try:
        _, uniq = lax.scan(body, init, None, length=max_groups)
    except TypeError:
        # shard_map: promote the unvarying init to the keys' varying axes
        axes = tuple(set(jax.typeof(keys).vma) - set(jax.typeof(init).vma))
        try:
            init2 = lax.pcast(init, axes, to="varying")
        except (AttributeError, TypeError):
            init2 = lax.pvary(init, axes)
        _, uniq = lax.scan(body, init2, None, length=max_groups)
    # rounds after exhaustion keep returning BIG
    found = uniq < BIG
    count = jnp.sum(found.astype(jnp.int32)) \
        + has_max_key.astype(jnp.int32)
    uniq = jnp.where(found, uniq, BIG)  # BIG slot represents the max key
    # gid by broadcast compare: [N, G] — G is small by contract
    eq = k64[:, None] == uniq[None, :]
    gid = jnp.argmax(eq, axis=1).astype(jnp.int32)
    matched = eq.any(axis=1) | (valid & (k64 == BIG))
    gid = jnp.where(valid & (k64 == BIG), count - 1, gid)
    T = table_size_for(max_groups)
    gid = jnp.where(valid & matched, gid, T)
    overflow = jnp.any(valid & ~matched & (k64 != BIG))
    return gid, uniq, count, overflow
