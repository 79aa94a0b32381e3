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


def group_ids(keys, valid=None, max_groups: int = 4096,
              table_factor: int = 4):
    """Assign dense group ids to ``keys``.

    Returns (gid[N] int32, unique_keys[T] int64, group_count, overflow):
    - gid ∈ [0, group_count) for valid rows; T for invalid rows
    - unique_keys: distinct keys compacted to rank order (tail undefined)
    - overflow: distinct keys exceeded the probe budget — caller retries
      with a larger ``max_groups`` (Status-style error, SURVEY.md §5.3)
    """
    n = keys.shape[0]
    T = table_size_for(max_groups, table_factor)
    keys = keys.astype(jnp.int64)
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    table_key = jnp.zeros((T + 1,), dtype=jnp.int64)
    table_occ = jnp.zeros((T + 1,), dtype=bool)
    h0 = (hash32(keys) % jnp.uint32(T)).astype(jnp.int32)

    def cond(state):
        i, _, _, unresolved, _ = state
        return jnp.logical_and(i < T, unresolved.any())

    def body(state):
        i, table_key, table_occ, unresolved, slot_of = state
        probe = ((h0 + i) % T).astype(jnp.int32)
        slot = jnp.where(unresolved, probe, T)  # parked rows write the dump
        # claim unoccupied slots (last writer wins; occupancy write is
        # value-identical for all writers so the pair stays consistent)
        claim = unresolved & ~table_occ[slot]
        claim_slot = jnp.where(claim, slot, T)
        table_key = table_key.at[claim_slot].set(keys, mode="drop")
        table_occ = table_occ.at[claim_slot].set(True, mode="drop")
        # re-read: settled if the slot now holds my key
        settled = unresolved & table_occ[slot] & (table_key[slot] == keys)
        slot_of = jnp.where(settled, slot, slot_of)
        return (i + 1, table_key, table_occ, unresolved & ~settled, slot_of)

    init = (jnp.int32(0), table_key, table_occ, valid,
            jnp.full((n,), T, dtype=jnp.int32))
    try:
        _, table_key, table_occ, unresolved, slot_of = lax.while_loop(
            cond, body, init)
    except TypeError:
        # under shard_map the fresh table constants are axis-unvarying while
        # the loop outputs vary over the partition axis; promote the carry
        axes = set(jax.typeof(keys).vma)  # varying manual axes

        def _pv(x):
            need = axes - set(jax.typeof(x).vma)
            return lax.pvary(x, tuple(need)) if need else x

        init = tuple(_pv(x) for x in init)
        _, table_key, table_occ, unresolved, slot_of = lax.while_loop(
            cond, body, init)
    overflow = unresolved.any()

    filled = table_occ[:T]
    rank = jnp.cumsum(filled.astype(jnp.int32)) - filled.astype(jnp.int32)
    group_count = jnp.sum(filled.astype(jnp.int32))
    gid = jnp.where(slot_of < T, rank[jnp.clip(slot_of, 0, T - 1)], T)
    gid = jnp.where(valid, gid, T).astype(jnp.int32)

    uniq = jnp.zeros((T + 1,), dtype=jnp.int64).at[
        jnp.where(filled, rank, T)].set(table_key[:T], mode="drop")[:T]
    return gid, uniq, group_count, overflow
