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

Backend dispatch: on TPU with integer keys/values and ≤128 groups, the
whole aggregate runs as ONE Pallas pass over HBM (kernels/agg_pallas.py —
group discovery and all accumulators in a single kernel), replacing a
distinct-key scan plus one masked [N, G] reduction per aggregate. Float
values, >128 groups, or non-TPU backends use the XLA path below.
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

    Two tiers: small G uses a dense [N, G] membership broadcast (pure VPU
    reductions, no scatter); large G switches to one scatter pass — the
    broadcast matrix is O(N·G) and at 4M rows × 128k groups would try to
    materialize terabytes.
    """
    G = _pad_groups(num_groups)
    if G > 1024:
        return _segment_reduce_scatter(gid, values, num_groups, G, kind,
                                       valid)
    groups = jnp.arange(G, dtype=gid.dtype)
    member = gid[:, None] == groups[None, :]
    if valid is not None and kind != "count_all":
        member = member & valid[:, None]

    if kind in ("sum", "mean"):
        acc_dtype = values.dtype
        if values.dtype in (jnp.int8, jnp.int16, jnp.int32):
            acc_dtype = jnp.int64
        elif values.dtype in (jnp.uint8, jnp.uint16, jnp.uint32):
            acc_dtype = jnp.uint64  # Acero: unsigned sums widen to uint64
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


def _segment_reduce_scatter(gid, values, num_groups: int, G: int, kind: str,
                            valid):
    """High-cardinality tier: one .at[gid].add/min/max scatter, O(N + G).

    Rows masked out (null value, or gid outside [0, num_groups)) are routed
    to a sacrificial slot G and sliced off."""
    # range-check in the ORIGINAL dtype before narrowing: an int64 gid
    # >= 2^31 would wrap into range after the cast and pollute a real
    # bucket (ADVICE r3)
    in_range = (gid >= 0) & (gid < num_groups)
    sac = jnp.int32(G)
    idx = jnp.where(in_range, jnp.clip(gid, 0, num_groups - 1), sac
                    ).astype(jnp.int32)
    if valid is not None and kind != "count_all":
        idx = jnp.where(valid, idx, sac)

    if kind in ("sum", "mean"):
        acc_dtype = values.dtype
        if values.dtype in (jnp.int8, jnp.int16, jnp.int32):
            acc_dtype = jnp.int64
        elif values.dtype in (jnp.uint8, jnp.uint16, jnp.uint32):
            acc_dtype = jnp.uint64
        out = jnp.zeros((G + 1,), dtype=acc_dtype).at[idx].add(
            values.astype(acc_dtype), mode="drop")
        return out[:G]
    if kind in ("count", "count_all"):
        out = jnp.zeros((G + 1,), dtype=jnp.int64).at[idx].add(
            jnp.int64(1), mode="drop")
        return out[:G]
    if kind == "min":
        if jnp.issubdtype(values.dtype, jnp.floating):
            ident = jnp.array(jnp.inf, dtype=values.dtype)
        else:
            ident = jnp.array(jnp.iinfo(values.dtype).max, dtype=values.dtype)
        out = jnp.full((G + 1,), ident).at[idx].min(values, mode="drop")
        return out[:G]
    if kind == "max":
        if jnp.issubdtype(values.dtype, jnp.floating):
            ident = jnp.array(-jnp.inf, dtype=values.dtype)
        else:
            ident = jnp.array(jnp.iinfo(values.dtype).min, dtype=values.dtype)
        out = jnp.full((G + 1,), ident).at[idx].max(values, mode="drop")
        return out[:G]
    raise ValueError(f"unknown aggregate kind {kind!r}")


_SIGNED_INTS = (jnp.int8, jnp.int16, jnp.int32, jnp.int64)
_UNSIGNED_INTS = (jnp.uint8, jnp.uint16, jnp.uint32, jnp.uint64)
_FLOATS = (jnp.float32, jnp.float64)


def _pallas_eligible(keys, aggs, values, max_groups: int,
                     backend: str) -> bool:
    """One-pass Pallas kernel preconditions (kernels/agg_pallas.py): TPU (or
    forced interpret mode for tests), integer keys, signed-integer or float
    values (r4: floats ride as normalized planes with compensated sums),
    group capacity within the kernel's 1024-slot chunked table (r4: was
    128)."""
    from .kernels.agg_pallas import G as _G

    if backend == "xla":
        return False
    if backend == "auto" and jax.default_backend() != "tpu":
        return False
    if max_groups > _G:
        return False
    kd = keys.dtype
    if not (jnp.issubdtype(kd, jnp.integer) or kd == jnp.bool_):
        return False
    for name, kind in aggs:
        if kind not in ("sum", "count", "count_all", "min", "max", "mean"):
            return False
        if kind == "count_all":
            continue
        arr, _ = values[name]
        if arr.dtype not in _SIGNED_INTS and arr.dtype not in _FLOATS \
                and arr.dtype not in _UNSIGNED_INTS:
            return False
    return True


def _hash_aggregate_pallas(keys, aggs, values, key_valid, row_valid,
                           max_groups: int, group_null_keys: bool,
                           interpret: bool, has_null_path: bool = True):
    """Decode layer over kernels/agg_pallas.aggregate_pallas matching the
    hash_aggregate output contract (same dict keys, dtypes, identities)."""
    from ..utils.bits import split_i64
    from .kernels import agg_pallas as ak

    n = keys.shape[0]
    Gcap = ak.capacity_for(max_groups)
    in_table = row_valid & key_valid
    has_null_path = has_null_path and group_null_keys
    null_rows = (row_valid & ~key_valid) if has_null_path \
        else jnp.zeros((n,), bool)
    kv = jnp.where(null_rows, jnp.int32(2),
                   jnp.where(in_table, jnp.int32(1), jnp.int32(0)))
    k64 = keys.astype(jnp.int64)
    klo, khi = (x.view(jnp.int32) for x in split_i64(k64))

    # assemble one ValueSpec per distinct value column actually referenced
    col_order: List[str] = []
    col_need: Dict[str, List[bool]] = {}
    for name, kind in aggs:
        if kind == "count_all":
            continue
        if name not in col_need:
            col_need[name] = [False, False]
            col_order.append(name)
        if kind in ("sum", "mean"):
            col_need[name][0] = True
        if kind in ("min", "max"):
            col_need[name][1] = True
    value_limbs = []
    specs = []
    lossy = jnp.zeros((), bool)
    for name in col_order:
        arr, vv = values[name]
        if arr.dtype in _FLOATS:
            # order-preserving normalized planes (sort._norm_f32): min/max
            # ride the integer lex compare; sums invert in-kernel
            from .sort import _norm_f32

            if arr.dtype == jnp.float64:
                hi = arr.astype(jnp.float32)
                lo = (arr - hi.astype(jnp.float64)).astype(jnp.float32)
                # f32-plane range guard (ADVICE r4): |x| beyond f32 range
                # rounds the hi plane to inf (sums go NaN), |x| below the
                # f32 normal floor flushes to zero on TPU (FTZ) and the
                # value vanishes from sums. Flag participating rows in
                # either regime through the overflow flag so callers retry
                # on the exact XLA path (backend="xla").
                danger = ~jnp.isfinite(hi) | \
                    ((arr != 0) & (jnp.abs(arr) <
                                   jnp.float64(np.finfo(np.float32).tiny)))
                part = row_valid & danger
                if vv is not None:
                    part = part & vv
                lossy = lossy | jnp.any(part)
            else:
                hi = jnp.zeros(arr.shape, jnp.float32)
                lo = arr
            vhi = (_norm_f32(hi) ^ jnp.uint32(0x8000_0000)).view(jnp.int32)
            vlo = _norm_f32(lo).view(jnp.int32)
            is_float = True
        elif arr.dtype == jnp.uint64:
            # order-preserving bias flip into int64 lanes (r5 — VERDICT r4
            # #8 unsigned encodings): min/max ride the signed compare and
            # decode by re-flipping; the kernel's mod-2^64 sum of biased
            # values decodes as sum - count·2^63 (mod 2^64). Empty-group
            # sentinels int64::max/min decode to uint64::max/0 — exactly
            # the unsigned identities.
            v64 = (arr ^ jnp.uint64(1 << 63)).view(jnp.int64)
            vlo, vhi = (x.view(jnp.int32) for x in split_i64(v64))
            is_float = False
        else:
            v64 = arr.astype(jnp.int64)
            vlo, vhi = (x.view(jnp.int32) for x in split_i64(v64))
            is_float = False
        limbs = [vlo, vhi]
        if vv is not None:
            limbs.append(vv.astype(jnp.int32))
        value_limbs.append(tuple(limbs))
        specs.append(ak.ValueSpec(want_sum=col_need[name][0],
                                  want_minmax=col_need[name][1],
                                  has_valid=vv is not None,
                                  is_float=is_float))
    if not col_order:
        # count_all-only query: ride the key limbs as a dummy value column
        value_limbs.append((klo, khi))
        specs.append(ak.ValueSpec(want_sum=False, want_minmax=False,
                                  has_valid=False))
        col_order.append("__rows__")

    # pad to the kernel's block multiple with kv=0 (non-existent rows)
    def _padded_len(m: int) -> int:
        while True:
            B = ak._choose_rows(m) * ak.LANE
            if m % B == 0:
                return m
            m = -(-m // B) * B

    n_pad = _padded_len(n)
    if n_pad != n:
        pad = n_pad - n

        def padz(x):
            return jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])

        kv, klo, khi = padz(kv), padz(klo), padz(khi)
        value_limbs = [tuple(padz(a) for a in limbs)
                       for limbs in value_limbs]

    tbl, cnt, ovf, per = ak.aggregate_pallas(
        kv, klo, khi, value_limbs, specs, max_groups=max_groups,
        has_null_path=has_null_path, interpret=interpret)

    G_out = max_groups + 1
    slots = jnp.arange(G_out)
    per_by_name = dict(zip(col_order, per))
    count_all_any = ak.counts_from(per[0])[0]             # [Gcap+8]
    has_null = (count_all_any[Gcap] > 0) if has_null_path \
        else jnp.array(False)
    overflow = (ovf > 0) | (cnt > max_groups) | lossy

    def place(decoded):
        """[Gcap+8] kernel slots → [G_out] output slots: real groups
        0..cnt-1 keep position (unused slots already hold the empty-group
        identity), the null group moves from reserved slot Gcap to dense
        slot cnt."""
        base = decoded[:G_out] if decoded.shape[0] >= G_out else \
            jnp.concatenate([decoded, jnp.full(
                (G_out - decoded.shape[0],), decoded[-1], decoded.dtype)])
        return jnp.where((slots == cnt) & has_null, decoded[Gcap], base)

    uniq64 = ak.keys_from_table(tbl)                      # [G]
    if uniq64.shape[0] < G_out:
        uniq64 = jnp.concatenate(
            [uniq64, jnp.zeros((G_out - uniq64.shape[0],), jnp.int64)])
    out = {
        "keys": jnp.where(slots < cnt, uniq64[:G_out], 0),
        "key_is_null": (slots == cnt) & has_null,
        "group_count": (cnt + has_null.astype(cnt.dtype)).astype(jnp.int32),
        "overflow": overflow,
    }
    for name, kind in aggs:
        cname = "__rows__" if kind == "count_all" and name not in \
            per_by_name else name
        acc = per_by_name[cname]
        call, cval = ak.counts_from(acc)
        if kind == "count_all":
            out[f"agg:{name}:count_all"] = place(call)
            continue
        vdt = values[name][0].dtype
        is_float = vdt in _FLOATS
        if kind == "count":
            out[f"agg:{name}:count"] = place(cval)
        elif kind in ("sum", "mean"):
            if is_float:
                s = place(ak.sum_from_float(acc))
                cv = place(cval)
                s = jnp.where(cv > 0, s, 0.0)
            else:
                s = place(ak.sum_from(acc))
                if vdt == jnp.uint64:
                    # undo the per-value 2^63 bias: mod-2^64 arithmetic
                    cv = place(cval)
                    s = s.view(jnp.uint64) - \
                        (cv.astype(jnp.uint64) << jnp.uint64(63))
                elif vdt in _UNSIGNED_INTS:
                    s = s.astype(jnp.uint64)  # Acero: unsigned sums → u64
            if kind == "sum":
                out[f"agg:{name}:sum"] = s.astype(vdt) if is_float else s
            else:
                c = place(cval)
                r = s.astype(jnp.float64) / jnp.maximum(c, 1)
                out[f"agg:{name}:mean"] = jnp.where(c > 0, r, jnp.nan)
        elif is_float:  # float min / max: denormalize the encoded planes
            (mnh, mnl), (mxh, mxl) = ak.minmax_bits_from(acc)
            h, l = (mnh, mnl) if kind == "min" else (mxh, mxl)

            def inv_plane(bits_i32):
                u = bits_i32.view(jnp.uint32)
                sign = jnp.uint32(0x8000_0000)
                b = jnp.where(u & sign != 0, u ^ sign, ~u)
                return b.view(jnp.float32)

            # hi plane carries the kernel's extra sign bias
            hv = inv_plane(h.view(jnp.uint32) ^ jnp.uint32(0x8000_0000))
            val = hv.astype(jnp.float64) + inv_plane(l).astype(jnp.float64)
            cv = place(cval)
            ident = jnp.inf if kind == "min" else -jnp.inf
            d = jnp.where(cv > 0, place(val), ident).astype(vdt)
            out[f"agg:{name}:{kind}"] = d
        else:  # integer min / max
            mn, mx = ak.minmax_from(acc)
            d = place(mn if kind == "min" else mx)
            if vdt == jnp.uint64:
                # re-flip the bias; the int64 sentinels map to the uint64
                # identities by construction (see the encode comment)
                d = d.view(jnp.uint64) ^ jnp.uint64(1 << 63)
            elif vdt != jnp.int64:
                # narrow dtype: swap the int64 empty-group sentinel for the
                # narrow identity BEFORE the cast (int64::max wraps to -1)
                ident = jnp.iinfo(vdt).max if kind == "min" \
                    else jnp.iinfo(vdt).min
                cv = place(cval)
                d = jnp.where(cv == 0, jnp.int64(int(ident)),
                              d).astype(vdt)
            out[f"agg:{name}:{kind}"] = d
    return out


def hash_aggregate(keys, aggs: Sequence[Tuple[str, str]],
                   values: Dict[str, Tuple],
                   key_valid=None, row_valid=None,
                   max_groups: int = 4096,
                   group_null_keys: bool = True,
                   backend: str = "auto"):
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
    # static: when no key validity exists, the kernel's null-group path
    # (SMEM scalar reductions per block) is compiled out entirely
    keys_maybe_null = key_valid is not None
    if row_valid is None:
        row_valid = jnp.ones((n,), dtype=bool)
    if key_valid is None:
        key_valid = jnp.ones((n,), dtype=bool)

    if backend not in ("auto", "xla", "pallas", "pallas_interpret"):
        raise ValueError(f"unknown hash_aggregate backend {backend!r}")
    if _pallas_eligible(keys, aggs, values, max_groups, backend):
        interpret = (backend == "pallas_interpret"
                     or jax.default_backend() != "tpu")
        return _hash_aggregate_pallas(keys, aggs, values, key_valid,
                                      row_valid, max_groups,
                                      group_null_keys, interpret,
                                      has_null_path=keys_maybe_null)

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
