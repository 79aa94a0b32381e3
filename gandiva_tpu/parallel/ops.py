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
              probe_key_valid=None, build_key_valid=None, seed: int = 0,
              build_unique: bool = False):
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
               probe_exists=pvalid, build_exists=bvalid,
               build_unique=build_unique)
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


# ---------------------------------------------------------------------------
# skew-aware join (BASELINE configs[3]: Zipfian probe keys)
# ---------------------------------------------------------------------------

def detect_hot_keys(keys, valid, axis: str, num_hot: int,
                    sample_stride: int = 64, hot_threshold: int = 4):
    """Sampled global histogram → hot-key table.

    Every shard samples its keys, the samples are all_gathered (identical
    result on every shard), and keys appearing ≥ hot_threshold times in the
    global sample are declared hot (SURVEY.md §5.7: the query-engine cousin
    of load-balanced schedules — detect hot keys, broadcast-join them, salt
    the rest). Returns (hot_keys[num_hot], hot_valid[num_hot]).
    """
    from ..ops.groupby import group_ids

    sample = keys[::sample_stride]
    svalid = valid[::sample_stride]
    all_s = lax.all_gather(sample, axis, tiled=True)
    all_v = lax.all_gather(svalid, axis, tiled=True)
    gid, uniq, gcount, _ = group_ids(all_s, all_v, max_groups=4 * num_hot)
    G = 4 * num_hot
    counts = jnp.zeros((G + 1,), jnp.int32).at[
        jnp.clip(gid, 0, G)].add(1, mode="drop")[:G]
    hot = counts >= hot_threshold
    # take the num_hot hottest (order by count, stable)
    order = jnp.argsort(-counts, stable=True)[:num_hot]
    hot_keys = uniq[order]
    hot_valid = hot[order] & (order < gcount)
    return hot_keys, hot_valid


def _is_in_table(keys, table_keys, table_valid):
    """Membership of each key in a small key table (broadcast compare)."""
    eq = keys[:, None] == table_keys[None, :]
    eq = eq & table_valid[None, :]
    return eq.any(axis=1)


def dist_join_skewed(probe_keys, probe_valid, probe_cols,
                     build_keys, build_valid, build_cols,
                     axis: str, probe_capacity: int, build_capacity: int,
                     out_capacity: int, how: str = "inner",
                     num_hot: int = 64, hot_replicate_capacity: int = 1024,
                     seed: int = 0, build_unique: bool = False):
    """Per-shard body: skew-aware inner/semi/left join.

    Hot probe keys (detected from a global sample) do NOT shuffle — their
    probe rows stay on the origin shard, and the matching build rows are
    replicated to every shard via all_gather. Cold keys hash-partition as
    usual. This bounds any shard's receive volume at
    cold_rows/P + its own hot rows, defusing Zipf skew (north_star:
    'skew-aware repartitioning').

    right/full (r5 — VERDICT r4 #5): unmatched-build emission must see the
    GLOBAL match truth for replicated hot rows (a replica may match on one
    shard only). The local join runs as inner (right) / left (full), the
    per-shard hit flags over the replicated block — whose [P*cap_h] layout
    is identical on every shard by construction — are pmax-combined over
    the mesh, and each unmatched hot row emits only on its origin shard.
    Cold build rows are fully local (their probes co-shuffle to the same
    shard), so their unmatched emission needs no collective. This function
    assumes non-null keys (use dist_join for null-key outer semantics).
    """
    if how not in ("inner", "semi", "left", "anti", "right", "full"):
        raise ValueError(f"unknown join type {how!r}")
    P = lax.axis_size(axis)
    me = lax.axis_index(axis)

    hot_keys, hot_valid = detect_hot_keys(probe_keys, probe_valid, axis,
                                          num_hot)

    # ---- build side: split hot rows out, replicate them ------------------
    b_hot = _is_in_table(build_keys, hot_keys, hot_valid) & build_valid
    from ..ops.compaction import compact_sort
    bidx, n_bhot, _ = compact_sort(b_hot)
    cap_h = min(hot_replicate_capacity, build_keys.shape[0])
    sel = jnp.minimum(bidx[:cap_h].astype(jnp.int32), build_keys.shape[0] - 1)
    hot_b_keys = build_keys[sel]
    hot_b_ok = jnp.arange(cap_h) < jnp.minimum(n_bhot, cap_h)
    hot_overflow = n_bhot > cap_h
    rep_keys = lax.all_gather(hot_b_keys, axis, tiled=True)      # [P*cap_h]
    rep_ok = lax.all_gather(hot_b_ok, axis, tiled=True)
    rep_cols = {}
    for name, (v, vv) in build_cols.items():
        from ..utils.bits import gather32
        g = gather32(v, sel)
        rep_cols[name] = (
            jax.tree_util.tree_map(lambda x: lax.all_gather(x, axis,
                                                            tiled=True),
                                   g),
            lax.all_gather(hot_b_ok if vv is None else (vv[sel] & hot_b_ok),
                           axis, tiled=True))

    # ---- shuffle the cold remainder --------------------------------------
    p_hot = _is_in_table(probe_keys, hot_keys, hot_valid)
    part_p = jnp.where(p_hot, me,
                       partition_of(probe_keys, P, jnp.uint32(seed)))

    pk, pvalid, pcols, ov1 = _shuffle_cols(
        probe_keys, probe_valid, probe_cols, axis, probe_capacity,
        part_ids=part_p, seed=seed)
    bk, bvalid, bcols, ov2 = _shuffle_cols(
        build_keys, build_valid & ~b_hot, build_cols, axis, build_capacity,
        part_ids=partition_of(build_keys, P, jnp.uint32(seed)), seed=seed)

    # ---- local join against shuffled-cold + replicated-hot build ---------
    all_bk = jnp.concatenate([bk, rep_keys])
    all_bvalid = jnp.concatenate([bvalid, rep_ok])
    all_bcols = {}
    for name in build_cols:
        v1, vv1 = bcols[name]
        v2, vv2 = rep_cols[name]
        all_bcols[name] = (jnp.concatenate([v1, v2]),
                           jnp.concatenate([
                               vv1 if vv1 is not None else bvalid, vv2]))

    # right/full run the pair part locally (inner / left) and append
    # unmatched build rows with global hit flags below
    base_how = {"right": "inner", "full": "left"}.get(how, how)
    res = join(pk, all_bk, out_capacity, base_how,
               probe_valid=None, build_valid=None,
               probe_exists=pvalid, build_exists=all_bvalid,
               build_unique=build_unique)

    if how in ("right", "full"):
        C = out_capacity
        nb_local = bk.shape[0]
        nb_all = all_bk.shape[0]
        r = jnp.arange(C)
        pair_ok = (r < res.count) & (res.build_idx >= 0)
        bi = jnp.where(pair_ok, res.build_idx, nb_all)
        bhit = jnp.zeros((nb_all + 1,), jnp.int32).at[bi].max(
            1, mode="drop")[:nb_all] > 0
        # replicated block: combine hit flags across the mesh (layout is
        # identical everywhere); each row emits only on its origin shard
        rep_hit = lax.pmax(bhit[nb_local:].astype(jnp.int32), axis) > 0
        own = (jnp.arange(P * cap_h) // cap_h) == me
        un_cold = bvalid & ~bhit[:nb_local]
        un_hot = rep_ok & ~rep_hit & own
        unmatched = jnp.concatenate([un_cold, un_hot])
        n_un = jnp.sum(unmatched.astype(jnp.int32))
        upos = jnp.cumsum(unmatched, dtype=jnp.int32) - unmatched
        total = res.count
        uslot = jnp.where(unmatched & (total + upos < C),
                          total + upos, C).astype(jnp.int32)
        build_out = jnp.concatenate(
            [res.build_idx, jnp.zeros((1,), res.build_idx.dtype)]
        ).at[uslot].set(jnp.arange(nb_all, dtype=res.build_idx.dtype),
                        mode="drop")[:C]
        probe_out = jnp.concatenate(
            [res.probe_idx, jnp.zeros((1,), res.probe_idx.dtype)]
        ).at[uslot].set(-1, mode="drop")[:C]
        total2 = total + n_un
        res = JoinResult(probe_out, build_out,
                         jnp.minimum(total2, C).astype(jnp.int32),
                         res.overflow | (total2 > C))

    out_cols, row_ok = gather_payload(
        res, probe_cols={**{n: v for n, v in pcols.items()},
                         "__probe_key": (pk, pvalid)},
        build_cols=all_bcols)
    overflow = ov1 | ov2 | res.overflow | hot_overflow
    return res, out_cols, row_ok, overflow
