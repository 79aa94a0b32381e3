"""Distributed operators: shuffle-composed join / aggregate / sort.

The scaling model (BASELINE north_star, SURVEY.md §2c): tables are
hash-partitioned across the 1-axis device mesh; operators run per-shard on
co-partitioned data after an all-to-all shuffle; results are exact because
equal keys always land on the same shard (same hash seed ⇒ co-partitioning).
All functions here are *per-shard* bodies meant to run inside
``jax.shard_map`` over ``mesh.PARTITION_AXIS``; they compose with the
expression engine (which is plain jnp and shard-transparent).

Distributed sort uses sampled range partitioning: every shard contributes a
key sample, splitters are the global sample quantiles (identical on every
shard via all_gather), rows shuffle to their range's shard, and a local sort
per shard yields a globally sorted table (shard p holds keys ≤ shard p+1's).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.hash_aggregate import hash_aggregate
from ..ops.hash_join import JoinResult, gather_payload, join
from ..ops.sort import SortKey, normalize_key, sort_permutation
from ..utils.bits import explode, rebuild
from .shuffle import exchange, flatten_received
from ..utils.hashing import partition_of


def _shuffle_cols(keys, valid, cols: Dict[str, Tuple], axis: str,
                  capacity: int, part_ids=None, seed=0):
    """Shuffle (keys + named columns with validity) by key hash.

    ``cols[name] = (values, validity-or-None)``. 64-bit columns ride as
    uint32 limb pairs. Returns (keys, valid, cols, overflow) flattened to
    [P*cap] per shard.
    """
    P = lax.axis_size(axis)
    if part_ids is None:
        part_ids = partition_of(keys, P, jnp.uint32(seed))
    flat_payload = {}
    meta = {}
    for i, part in enumerate(explode(keys)):
        flat_payload[f"__key{i}"] = part
    meta["__key"] = (keys.dtype, len(explode(keys)))
    for name, (vals, vv) in cols.items():
        parts = explode(vals)
        meta[name] = (vals.dtype, len(parts))
        for i, part in enumerate(parts):
            flat_payload[f"{name}__{i}"] = part
        if vv is not None:
            flat_payload[f"{name}__v"] = vv
    recv, counts, overflow = exchange(part_ids, valid, flat_payload, axis,
                                      capacity)
    flat, fvalid = flatten_received(recv, counts)

    kdtype, kn = meta["__key"]
    out_keys = rebuild([flat[f"__key{i}"] for i in range(kn)], kdtype)
    out_cols = {}
    for name, (vals, vv) in cols.items():
        dt_, n_ = meta[name]
        v = rebuild([flat[f"{name}__{i}"] for i in range(n_)], dt_)
        ov = flat.get(f"{name}__v")
        out_cols[name] = (v, ov)
    return out_keys, fvalid, out_cols, overflow


def dist_hash_aggregate(keys, row_valid, values: Dict[str, Tuple],
                        aggs, axis: str, capacity: int,
                        key_valid=None, max_groups: int = 4096,
                        seed: int = 0):
    """Per-shard body: shuffle by key, then locally aggregate.

    After the shuffle every key lives on exactly one shard, so local
    aggregation is globally exact; each shard's outputs are disjoint group
    sets. Null keys all route to one fixed shard (partition of a seed-keyed
    constant) so the null group stays single-shard.
    """
    P = lax.axis_size(axis)
    if key_valid is None:
        key_valid = jnp.ones_like(row_valid)
    part = partition_of(keys, P, jnp.uint32(seed))
    # null keys all travel to a fixed shard (partition of "key 0", seed-keyed)
    null_part = partition_of(jnp.zeros((1,), keys.dtype), P,
                             jnp.uint32(seed ^ 0x5EED))[0]
    part = jnp.where(key_valid, part, null_part)
    kk, fvalid, cols, overflow = _shuffle_cols(
        keys, row_valid, {**values, "__kv": (key_valid, None)},
        axis, capacity, part_ids=part, seed=seed)
    kv = cols.pop("__kv")[0]
    res = hash_aggregate(kk, aggs, cols, key_valid=kv, row_valid=fvalid,
                         max_groups=max_groups)
    res["overflow"] = res["overflow"] | overflow
    return res


def dist_join(probe_keys, probe_valid, probe_cols: Dict[str, Tuple],
              build_keys, build_valid, build_cols: Dict[str, Tuple],
              axis: str, probe_capacity: int, build_capacity: int,
              out_capacity: int, how: str = "inner",
              probe_key_valid=None, build_key_valid=None, seed: int = 0):
    """Per-shard body: co-shuffle both sides by key hash, then local join.

    Same hash seed on both sides ⇒ equal keys co-locate ⇒ the union of
    per-shard joins is the global join. Null-key rows stay on their origin
    shard (they never match; outer-side emission is purely local).
    """
    P = lax.axis_size(axis)
    me = lax.axis_index(axis)

    def route(keys, kv):
        part = partition_of(keys, P, jnp.uint32(seed))
        return part if kv is None else jnp.where(kv, part, me)

    pk, pvalid, pcols, ov1 = _shuffle_cols(
        probe_keys, probe_valid,
        {**probe_cols, "__kv": ((probe_key_valid if probe_key_valid
                                 is not None else jnp.ones_like(probe_valid)),
                                None)},
        axis, probe_capacity,
        part_ids=route(probe_keys, probe_key_valid), seed=seed)
    pkv = pcols.pop("__kv")[0]
    bk, bvalid, bcols, ov2 = _shuffle_cols(
        build_keys, build_valid,
        {**build_cols, "__kv": ((build_key_valid if build_key_valid
                                 is not None else jnp.ones_like(build_valid)),
                                None)},
        axis, build_capacity,
        part_ids=route(build_keys, build_key_valid), seed=seed)
    bkv = bcols.pop("__kv")[0]

    # existence = the row actually arrived in the shuffle; key validity =
    # the original null mask (travelled as __kv). join() keeps them distinct.
    res = join(pk, bk, out_capacity, how,
               probe_valid=pkv, build_valid=bkv,
               probe_exists=pvalid, build_exists=bvalid)
    out_cols, row_ok = gather_payload(
        res, probe_cols={**{n: (v, vv) for n, (v, vv) in pcols.items()},
                         "__probe_key": (pk, pvalid)},
        build_cols={n: (v, vv) for n, (v, vv) in bcols.items()})
    overflow = ov1 | ov2 | res.overflow
    return res, out_cols, row_ok, overflow


def dist_sort(keys, key_valid, payload: Dict[str, Tuple], axis: str,
              capacity: int, ascending: bool = True,
              nulls_first: bool = True, sample_stride: int = 64,
              exists=None):
    """Per-shard body: sampled range partition → shuffle → local sort.

    ``key_valid``: null-key mask — null rows travel to the extreme shard and
    sort to the requested end. ``exists``: rows that exist at all (padding
    never travels). Returns per-shard sorted (keys, row_valid, key_null,
    payload, overflow); globally sorted across shards in mesh order.
    """
    P = lax.axis_size(axis)
    n = keys.shape[0]
    if exists is None:
        exists = jnp.ones((n,), dtype=bool)
    norm = normalize_key(keys, ascending)
    # null ordering: give nulls the extreme rank on the requested end so the
    # range partitioner routes them to the first/last shard
    if nulls_first:
        nullv = jnp.zeros((), norm.dtype)
    else:
        nullv = jnp.array(jnp.iinfo(norm.dtype).max, norm.dtype)
    rank = jnp.where(key_valid, norm, nullv)

    # sample + all_gather → global splitters (identical on all shards)
    sample = lax.sort(jnp.where(exists[::sample_stride],
                                rank[::sample_stride], nullv))
    all_samples = lax.all_gather(sample, axis, tiled=True)
    ssorted = lax.sort(all_samples)
    m = ssorted.shape[0]
    cut_idx = (jnp.arange(1, P, dtype=jnp.int32) * m) // P
    splitters = ssorted[cut_idx]  # [P-1]
    part = jnp.searchsorted(splitters, rank, side="right").astype(jnp.int32)

    recv_keys, fvalid, cols, overflow = _shuffle_cols(
        keys, exists, {**payload, "__nullv": (key_valid, None)}, axis,
        capacity, part_ids=part)
    key_null = ~cols.pop("__nullv")[0]

    # one stable sort: non-arrived slots to the back, then null placement,
    # then the normalized key (null rows' garbage keys pinned for stability)
    kvalid = fvalid & ~key_null
    nr = kvalid if nulls_first else jnp.logical_not(kvalid)
    normk = normalize_key(recv_keys, ascending)
    normk = jnp.where(kvalid, normk, jnp.zeros_like(normk))
    idx = jnp.arange(recv_keys.shape[0], dtype=jnp.int32)
    res = lax.sort((jnp.logical_not(fvalid), nr, normk, idx),
                   num_keys=3, is_stable=True)
    perm = res[-1]

    out_keys = recv_keys[perm]
    out_valid = fvalid[perm]
    out_key_null = key_null[perm]
    out_payload = {}
    for name, (v, vv) in cols.items():
        from ..utils.bits import gather32
        out_payload[name] = (gather32(v, perm),
                             None if vv is None else vv[perm])
    return (out_keys, out_valid, out_key_null, out_payload, overflow)
