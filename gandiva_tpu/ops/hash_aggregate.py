"""Hash aggregate: GROUP BY key with sum/count/min/max/mean.

Behavioral oracle: pyarrow.acero's 'aggregate' Declaration (SURVEY.md §2c,
BASELINE configs[1]). TPU design:

1. group-id assignment — exact distinct-key hash table (ops/groupby.py);
2. segment reduction — masked broadcast-reduce ``reduce(where(gid==g, v,
   identity))`` over a static group axis. XLA fuses the compare/select into
   the reduction loop (no [N, G] materialization), which keeps the pass
   HBM-bound: one read of gid + one read of values per aggregate batch.

Null semantics match Acero: null keys form their own group (optional), sum/
count/min/max skip null values, count counts non-null. Group output order is
hash-slot order — deterministic for a given key set but not Acero's order;
differential tests compare after sorting by key. Float sums use XLA's
deterministic tree reduction order (documented divergence from Acero's
sequential order: same set of addends, different association).

Aggregate kinds: "sum", "count", "count_all", "min", "max", "mean".
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .groupby import distinct_small, group_ids, table_size_for

_LANE = 128


def _pad_groups(g: int) -> int:
    return max(_LANE, -(-g // _LANE) * _LANE)


def segment_reduce(gid, values, num_groups: int, kind: str,
                   valid=None):
    """Reduce ``values`` into ``num_groups`` buckets keyed by ``gid``.

    ``gid`` rows outside [0, num_groups) fall into no bucket. ``valid``
    masks out null values (rows still belong to their group for count_all).
    """
    G = _pad_groups(num_groups)
    groups = jnp.arange(G, dtype=gid.dtype)
    member = gid[:, None] == groups[None, :]
    if valid is not None and kind != "count_all":
        member = member & valid[:, None]

    if kind in ("sum", "mean"):
        acc_dtype = values.dtype
        if values.dtype in (jnp.int8, jnp.int16, jnp.int32):
            acc_dtype = jnp.int64
        z = jnp.zeros((), dtype=acc_dtype)
        return jnp.sum(jnp.where(member, values[:, None].astype(acc_dtype),
                                 z), axis=0)
    if kind in ("count", "count_all"):
        return jnp.sum(member.astype(jnp.int64), axis=0)
    if kind == "min":
        if jnp.issubdtype(values.dtype, jnp.floating):
            ident = jnp.array(jnp.inf, dtype=values.dtype)
        else:
            ident = jnp.array(jnp.iinfo(values.dtype).max, dtype=values.dtype)
        return jnp.min(jnp.where(member, values[:, None], ident), axis=0)
    if kind == "max":
        if jnp.issubdtype(values.dtype, jnp.floating):
            ident = jnp.array(-jnp.inf, dtype=values.dtype)
        else:
            ident = jnp.array(jnp.iinfo(values.dtype).min, dtype=values.dtype)
        return jnp.max(jnp.where(member, values[:, None], ident), axis=0)
    raise ValueError(f"unknown aggregate kind {kind!r}")


def hash_aggregate(keys, aggs: Sequence[Tuple[str, str]],
                   values: Dict[str, Tuple],
                   key_valid=None, row_valid=None,
                   max_groups: int = 4096,
                   group_null_keys: bool = True):
    """GROUP BY ``keys`` computing ``aggs`` = [(value_name, kind), ...].

    ``values[name] = (array, validity-or-None)``. Returns a dict:
      {"keys": unique_keys[max_groups+1], "key_is_null": bool[...],
       "group_count": scalar, "overflow": scalar,
       "agg:<name>:<kind>": array[max_groups+1]}
    Row ``group_count-1``... groups occupy the first group_count slots;
    the (optional) null-key group, when present, is the slot at index
    group_count-1 with key_is_null set. Fully traceable (jit/shard_map-safe).
    """
    n = keys.shape[0]
    if row_valid is None:
        row_valid = jnp.ones((n,), dtype=bool)
    if key_valid is None:
        key_valid = jnp.ones((n,), dtype=bool)

    in_table = row_valid & key_valid
    if max_groups <= 256:
        # low-cardinality fast path: scatter-free min-extraction discovery
        # (the hash table costs seconds at 100M rows; see groupby.py)
        gid, uniq, gcount, overflow = distinct_small(keys, in_table,
                                                     max_groups=max_groups)
    else:
        gid, uniq, gcount, overflow = group_ids(keys, in_table,
                                                max_groups=max_groups)
    G_out = max_groups + 1  # slot for the null-key group
    overflow = overflow | (gcount > max_groups)
    if uniq.shape[0] < G_out:  # distinct_small returns exactly max_groups
        uniq = jnp.concatenate(
            [uniq, jnp.zeros((G_out - uniq.shape[0],), uniq.dtype)])

    if group_null_keys:
        null_rows = row_valid & ~key_valid
        has_null_group = null_rows.any()
        null_gid = gcount  # dense id right after the real groups
        gid = jnp.where(null_rows, null_gid, gid)
        total_groups = gcount + has_null_group.astype(gcount.dtype)
    else:
        has_null_group = jnp.array(False)
        total_groups = gcount

    out = {
        "keys": uniq[:G_out],
        "key_is_null": (jnp.arange(G_out) == gcount) & has_null_group,
        "group_count": total_groups,
        "overflow": overflow,
    }
    Gp = _pad_groups(G_out)
    for name, kind in aggs:
        if kind == "count_all":
            arr = jnp.zeros((n,), dtype=jnp.int64)
            vv = None
        else:
            arr, vv = values[name]
        if kind == "mean":
            s = segment_reduce(gid, arr, G_out, "sum", vv)
            c = segment_reduce(gid, arr, G_out, "count", vv)
            r = s.astype(jnp.float64) / jnp.maximum(c, 1)
            r = jnp.where(c > 0, r, jnp.nan)
            out[f"agg:{name}:mean"] = r[:G_out]
        else:
            r = segment_reduce(gid, arr, G_out, kind, vv)
            out[f"agg:{name}:{kind}"] = r[:G_out]
    return out
