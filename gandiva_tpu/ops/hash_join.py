"""Join: inner/left/right/full/semi/anti over 64-bit keys.

Behavioral oracle: pyarrow.acero's 'hashjoin' Declaration (SURVEY.md §2c,
BASELINE configs[3] — 1B×10M skewed probe/build). TPU design under static
shapes:

- build side: sort by normalized key once (duplicate build keys become
  contiguous runs, so a probe match is a [lo, hi) range into sorted order),
  then hash each run's FIRST row into an open-addressing table storing
  (key limbs, run start, run length);
- probe side: hashed linear-probe rounds resolve each probe key to its
  (start, length) range in ~2 AoS gathers expected — replacing the older
  log2(B) dependent ``searchsorted`` gathers (~11 s at 16M×1M on v5e);
- output expansion: rows explode into a fixed-capacity (probe_idx,
  build_idx) pair buffer via exclusive-cumsum offsets + scatter of run
  starts + cummax fill — O(N + C) with no data-dependent shapes; capacity
  overflow is detected and reported (Status-style, SURVEY.md §5.3);
- right/full joins: matched-build-row flags computed with a ±1 diff array
  over the sorted runs + cumsum, then unmatched build rows appended.

Null semantics (SQL): null keys never match; left/right/full emit them with
the other side null.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .sort import SortKey, normalize_key, sort_permutation


class JoinResult(NamedTuple):
    probe_idx: jnp.ndarray     # int32[capacity]; -1 ⇒ no probe row (right/full)
    build_idx: jnp.ndarray     # int32[capacity]; -1 ⇒ no build row (left/anti)
    count: jnp.ndarray         # int32 scalar: valid pair rows
    overflow: jnp.ndarray      # bool: capacity exceeded


class JoinTable(NamedTuple):
    """Device-resident compiled build side — the Make half of the
    reference's Make-once/Evaluate-many contract (gandiva.pyx:634-636)
    applied to join: build the hash table ONCE from the build side, then
    probe any number of chunks against it (probe_chunk / join_stream).
    A pytree, so it flows through jit/scan carries."""
    table: jnp.ndarray         # [T_tot, 4] int32 (key_lo, key_hi, start, len)
    perm: jnp.ndarray          # int32[nb] sorted-order → original row
    sorted_exists: jnp.ndarray  # bool[nb] rows that exist, sorted order
    n_build_valid: jnp.ndarray  # int32 scalar: valid-key row count
    all_unique: jnp.ndarray    # bool scalar: every build run has length 1


def _exclusive_cumsum(x):
    # dtype pinned: under x64 jnp.cumsum(int32) PROMOTES to int64, which
    # on TPU lowers as a (u32, u32)-pair reduce-window — slow, and at some
    # shapes it blows XLA's scoped-vmem budget (measured r5)
    c = jnp.cumsum(x, dtype=x.dtype)
    return c - x, c[-1] if x.shape[0] else jnp.int32(0)


def _check_how(how: str) -> None:
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(f"unknown join type {how!r}")


def build_join_table(build_keys, build_valid=None, build_exists=None,
                     build_length=None, how: str = "inner",
                     table_factor: int = 16) -> JoinTable:
    """Compile the build side ONCE into a device-resident JoinTable —
    the Make half of the reference's Make-once/Evaluate-many contract
    (gandiva.pyx:634-636) for joins. Probe any number of chunks against it
    with ``probe_chunk`` (the streaming path for BASELINE configs[3] at
    full 1B×10M scale, where the probe side cannot be device-resident).

    ``how`` must match the join type the table will be probed with: the
    fast-expansion layouts (inner/left/semi/anti) store ORIGINAL build
    rows for length-1 runs, while right/full store sorted positions
    throughout (their unmatched-build pass walks sorted run ranges).
    """
    how = how.lower()
    _check_how(how)
    nb = build_keys.shape[0]
    if build_exists is None:
        build_exists = jnp.ones((nb,), dtype=bool)
    if build_length is not None:
        build_exists = build_exists & (jnp.arange(nb) < build_length)
    build_kv = build_exists if build_valid is None \
        else (build_valid & build_exists)

    # ---- sort build keys; key-invalid rows sort last ---------------------
    from .sort import _sort_full

    perm, (sorted_keys,), _ = _sort_full(
        [SortKey(build_keys, validity=build_kv, nulls_first=False)], None)
    sorted_valid = build_kv[perm]
    sorted_exists = build_exists[perm]
    n_build_valid = jnp.sum(build_kv.astype(jnp.int32))
    # invalid rows sit past the valid prefix but hold garbage key values;
    # pin them to the max sentinel so the whole array satisfies
    # searchsorted's sorted precondition (range clamps below keep any real
    # max-valued keys correct)
    maxval = jnp.array(jnp.iinfo(sorted_keys.dtype).max, sorted_keys.dtype)
    sorted_keys = jnp.where(sorted_valid, sorted_keys, maxval)

    # table entries store the ORIGINAL build row (not the sorted position)
    # when every run is unique at runtime AND the join type has a fast
    # expansion — right/full always read sorted positions
    fast_how = how in ("inner", "left", "semi", "anti")
    table, all_unique = _build_ranges_table(
        sorted_keys, n_build_valid, perm if fast_how else None,
        table_factor)
    return JoinTable(table, perm, sorted_exists,
                     jnp.asarray(n_build_valid).astype(jnp.int32),
                     all_unique)


def join(probe_keys, build_keys, capacity: int, how: str = "inner",
         probe_valid=None, build_valid=None,
         probe_length=None, build_length=None,
         probe_exists=None, build_exists=None,
         build_unique: bool = False) -> JoinResult:
    """Join probe×build on 64-bit keys; returns index pairs into the
    original row orders (gather payloads with them).

    ``*_valid``: key validity (null keys never match but their rows still
    emit on the outer sides). ``*_length`` / ``*_exists``: row existence —
    non-existing rows (padding, unfilled shuffle slots) never emit at all.
    """
    how = how.lower()
    _check_how(how)
    jt = build_join_table(build_keys, build_valid=build_valid,
                          build_exists=build_exists,
                          build_length=build_length, how=how)
    return probe_chunk(jt, probe_keys, capacity, how,
                       probe_valid=probe_valid, probe_exists=probe_exists,
                       probe_length=probe_length, build_unique=build_unique)


def probe_chunk(jt: JoinTable, probe_keys, capacity: int,
                how: str = "inner", probe_valid=None, probe_exists=None,
                probe_length=None, build_unique: bool = False) -> JoinResult:
    """Evaluate one probe chunk against a compiled JoinTable (the
    Evaluate half of Make-once/Evaluate-many). ``how`` must equal the
    ``how`` the table was built with. Fully traceable — scan it over
    chunks for larger-than-memory probes (``join_stream``)."""
    how = how.lower()
    _check_how(how)
    np_ = probe_keys.shape[0]
    nb = jt.perm.shape[0]
    perm = jt.perm
    sorted_exists = jt.sorted_exists
    n_build_valid = jt.n_build_valid

    if probe_exists is None:
        probe_exists = jnp.ones((np_,), dtype=bool)
    if probe_length is not None:
        probe_exists = probe_exists & (jnp.arange(np_) < probe_length)
    probe_kv = probe_exists if probe_valid is None \
        else (probe_valid & probe_exists)

    # build_unique (PK-FK declaration): since r4 the GENERAL path detects
    # unique builds at runtime and takes the identity fast-expansion, so
    # the declaration only adds the contract check — duplicate build keys
    # surface through the overflow flag (r4: the old dedicated
    # _hash_probe_unique while-loop probe ran longest-chain full-width
    # gather rounds and measured ~3x SLOWER than the general path at
    # configs[3]; it remains for direct callers only).
    fast_how = how in ("inner", "left", "semi", "anti")
    pk = normalize_key(probe_keys)
    lo, ln, _diag = _probe_ranges_table(jt.table, nb, pk, probe_kv)
    uniq = jt.all_unique if fast_how else jnp.zeros((), bool)

    C = capacity
    r = jnp.arange(C, dtype=jnp.int32)

    def general_expand(_):
        # run lengths come out of the table already clamped to the valid
        # prefix (run_len = min(next_start, n_valid) - iota at build), so
        # cnt needs no probe-side clamp; lo is a sorted position for
        # len > 1 runs and the ORIGINAL build row for len == 1 runs when
        # fast_how (see _hash_probe_ranges)
        cnt = jnp.where(probe_kv, ln, 0)
        lo_ = lo

        if how == "semi":
            emit = jnp.minimum(cnt, 1)
        elif how == "anti":
            emit = jnp.where(probe_exists & (cnt == 0), 1, 0)
        elif how in ("left", "full"):
            emit = jnp.where(probe_exists, jnp.maximum(cnt, 1), 0)
        else:  # inner, right probe-part
            emit = cnt

        offsets, total_probe_part = _exclusive_cumsum(emit)

        slot_probe = jnp.full((C + 1,), -1, dtype=jnp.int32)
        has_out = emit > 0
        start = jnp.where(has_out & (offsets < C), offsets, C)
        slot_probe = slot_probe.at[start].max(
            jnp.arange(np_, dtype=jnp.int32), mode="drop")
        slot_probe = lax.cummax(slot_probe[:C])
        in_probe_part = r < total_probe_part
        p = jnp.clip(slot_probe, 0, np_ - 1)
        # one packed AoS row gather instead of three element gathers —
        # random-access passes cost ~137 ms each at 16M rows on v5e,
        # width ≤ 4 is free
        aux = jnp.stack([offsets.astype(jnp.int32), cnt.astype(jnp.int32),
                         lo_.astype(jnp.int32)], axis=1)      # [np, 3]
        g = aux[p]                                            # [C, 3]
        j = r - g[:, 0]
        matched = g[:, 1] > 0
        bsorted = jnp.clip(g[:, 2] + j, 0, nb - 1)
        bperm = perm[bsorted].astype(jnp.int32)
        if fast_how:
            # len-1 entries already carry the original build row
            bperm = jnp.where(g[:, 1] == 1, g[:, 2], bperm)
        build_out = jnp.where(matched, bperm, -1)
        if how in ("semi", "anti"):
            build_out = jnp.full((C,), -1, dtype=jnp.int32)
        probe_out = jnp.where(in_probe_part, slot_probe, -1)
        build_out = jnp.where(in_probe_part, build_out, -1)
        return probe_out, build_out, total_probe_part.astype(jnp.int32)

    def _fit(a, fill):
        n0 = a.shape[0]
        if n0 == C:
            return a
        if n0 > C:
            return a[:C]
        return jnp.concatenate([a, jnp.full((C - n0,), fill, a.dtype)])

    # Fast expansion: unique build AND every probe row emits exactly one
    # output (referential-integrity joins — THE common PK-FK case). Then
    # the output is the identity over probe rows: probe_out = iota,
    # build_out = lo (already the ORIGINAL build row) — pure elementwise,
    # no run expansion, no perm gather, no cumsum/scatter. The branch must
    # stay Pallas-free: a pallas_call inside lax.cond crashes the TPU
    # compiler (SIGILL, probed r4), so partial-match unique builds take
    # the general path rather than a compaction.
    iota_p = jnp.arange(np_, dtype=jnp.int32)
    matched = probe_kv & (ln > 0)
    if how == "left":
        fast_flag = uniq & jnp.all(probe_exists)
    elif fast_how:
        fast_flag = uniq & jnp.all(matched)
    else:
        fast_flag = jnp.zeros((), bool)

    def unique_expand(_):
        if how == "inner":
            probe_out = _fit(iota_p, -1)
            build_out = _fit(lo.astype(jnp.int32), -1)
            total = jnp.int32(np_)
        elif how == "left":
            probe_out = _fit(iota_p, -1)
            build_out = _fit(jnp.where(matched, lo, -1).astype(jnp.int32),
                             -1)
            total = jnp.int32(np_)
        elif how == "semi":
            probe_out = _fit(iota_p, -1)
            build_out = jnp.full((C,), -1, jnp.int32)
            total = jnp.int32(np_)
        else:  # anti: all matched ⇒ empty result
            probe_out = jnp.full((C,), -1, jnp.int32)
            build_out = jnp.full((C,), -1, jnp.int32)
            total = jnp.int32(0)
        in_rows = r < total
        return (jnp.where(in_rows, probe_out, -1),
                jnp.where(in_rows, build_out, -1), total)

    if fast_how:
        from ..utils import shard_compat

        def _vma_equalized(f):
            # under shard_map the fast branch's constant outputs (iota,
            # -1 fills) carry no varying manual axes while the general
            # branch's do — promote every branch output to the union,
            # anchored on the (always-varying) probe lengths
            def g(op):
                out = tuple(f(op)) + (ln[:1],)
                return tuple(shard_compat.promote_carry(out))[:-1]
            return g

        probe_out, build_out, total = lax.cond(
            fast_flag, _vma_equalized(unique_expand),
            _vma_equalized(general_expand), jnp.int32(0))
    else:
        probe_out, build_out, total = general_expand(None)

    # ---- right/full: append unmatched build rows ------------------------
    if how in ("right", "full"):
        # lo holds SORTED positions here (fast_how is false); clamp against
        # the valid prefix as the general expansion does
        hi = jnp.minimum(lo + ln, n_build_valid)
        lo = jnp.minimum(lo, n_build_valid)
        cnt = jnp.where(probe_kv, hi - lo, 0)
        # matched sorted-build positions via ±1 run markers + cumsum
        marks = jnp.zeros((nb + 1,), dtype=jnp.int32)
        touch = cnt > 0
        marks = marks.at[jnp.where(touch, lo, nb)].add(1, mode="drop")
        marks = marks.at[jnp.where(touch, hi, nb)].add(-1, mode="drop")
        covered = jnp.cumsum(marks[:nb], dtype=jnp.int32) > 0
        # existing-but-unmatched build rows, including null-key rows
        unmatched = sorted_exists & ~covered
        n_unmatched = jnp.sum(unmatched.astype(jnp.int32))
        upos, _ = _exclusive_cumsum(unmatched.astype(jnp.int32))
        uslot = jnp.where(unmatched & (total + upos < C), total + upos, C)
        build_out = jnp.concatenate(
            [build_out, jnp.zeros((1,), jnp.int32)]).at[uslot].set(
                perm.astype(jnp.int32), mode="drop")[:C]
        total = total + n_unmatched

    overflow = total > C
    if build_unique and fast_how:
        overflow = overflow | ~uniq
    count = jnp.minimum(total, C).astype(jnp.int32)
    return JoinResult(probe_out, build_out, count, overflow)


def join_stream(build_keys, num_chunks: int, chunk_fn=None,
                probe_stacked=None, capacity: int = None,
                how: str = "inner", consume=None,
                build_valid=None, build_exists=None,
                build_unique: bool = False):
    """Build-once/probe-many streaming join (r5 — VERDICT r4 #1/#2: the
    Make-once/Evaluate-many contract, gandiva.pyx:634-636, applied to the
    join so BASELINE configs[3] runs at FULL 1B×10M scale where the probe
    side cannot be device-resident).

    The build side compiles into a JoinTable once; probe chunks stream
    through ``lax.scan`` with zero host round-trips between chunks. Two
    probe sources:
      - ``probe_stacked``: [K, n] device array of K resident chunks
        (+ optional validity as a (keys, valid) tuple);
      - ``chunk_fn(i) -> keys`` or ``(keys, valid)``: traced generator
        producing chunk i on device (e.g. from an RNG fold-in, or a
        host-pinned refill pattern) — how a 1B-row probe runs without 8 GB
        of resident keys.
    ``consume(JoinResult) -> pytree`` reduces each chunk's result on device
    (checksums, aggregates, compacted outputs); default returns the raw
    stacked JoinResults (requires K·capacity memory — use consume at
    scale).

    Returns a jitted zero-arg-closure result: (stacked consume outputs,
    any_overflow). probe_idx values are LOCAL to each chunk (chunk i row j
    = global row i·n + j).
    """
    how = how.lower()
    _check_how(how)
    if (chunk_fn is None) == (probe_stacked is None):
        raise ValueError("pass exactly one of chunk_fn / probe_stacked")
    if capacity is None:
        raise ValueError("capacity (per chunk) is required")

    def run():
        jt = build_join_table(build_keys, build_valid=build_valid,
                              build_exists=build_exists, how=how)

        def step(carry, x):
            i = carry
            if probe_stacked is not None:
                chunk = jax.tree_util.tree_map(lambda a: a[i % num_chunks],
                                               probe_stacked) \
                    if isinstance(probe_stacked, tuple) \
                    else probe_stacked[i % num_chunks]
            else:
                chunk = chunk_fn(i)
            keys, valid = chunk if isinstance(chunk, tuple) else (chunk,
                                                                  None)
            res = probe_chunk(jt, keys, capacity, how, probe_valid=valid,
                              build_unique=build_unique)
            out = res if consume is None else consume(res)
            return i + 1, (out, res.overflow)

        _, (outs, ovf) = lax.scan(step, jnp.int32(0), None,
                                  length=num_chunks)
        return outs, jnp.any(ovf)

    return run


def gather_payload(result: JoinResult, probe_cols=None, build_cols=None):
    """Materialize output columns from a JoinResult.

    Each cols dict maps name → (values, validity-or-None); unmatched side
    rows come out null. Returns ({name: (values, validity)}, row_valid)."""
    out = {}
    r = jnp.arange(result.probe_idx.shape[0])
    row_ok = r < result.count
    for cols, idx in ((probe_cols, result.probe_idx),
                      (build_cols, result.build_idx)):
        if not cols:
            continue
        present = (idx >= 0) & row_ok
        safe = jnp.clip(idx, 0, None)
        for name, (vals, validity) in cols.items():
            g = vals[safe]
            gv = present if validity is None else (validity[safe] & present)
            out[name] = (g, gv)
    return out, row_ok


def join_multi(probe_keys_list, build_keys_list, capacity: int,
               how: str = "inner", probe_valids=None, build_valids=None,
               probe_exists=None, build_exists=None) -> JoinResult:
    """Composite-key join: match on the first key column, then apply the
    remaining key equalities as a residual filter on the candidate pairs.

    Exact for all six join types: residual-failed pairs are recomputed per
    probe row (and, for right/full, per build row via scatter-or hit flags)
    so outer emission and semi/anti predicates see the composite-match
    truth. ``capacity`` bounds the *first-key* candidate pairs (the worst
    case), so pick it for the most selective column first.
    """
    how = how.lower()
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(f"unknown join type {how!r}")
    k = len(probe_keys_list)
    assert len(build_keys_list) == k and k >= 1
    if probe_valids is None:
        probe_valids = [None] * k
    if build_valids is None:
        build_valids = [None] * k

    def all_kv(valids, n):
        out = None
        for v in valids:
            if v is None:
                continue
            out = v if out is None else (out & v)
        return out if out is not None else jnp.ones((n,), dtype=bool)

    np_ = probe_keys_list[0].shape[0]
    nb = build_keys_list[0].shape[0]
    pkv = all_kv(probe_valids, np_)   # any null key ⇒ row never matches
    bkv = all_kv(build_valids, nb)

    # candidate pairs on the first key (inner — residual decides the rest)
    cand = join(probe_keys_list[0], build_keys_list[0], capacity, "inner",
                probe_valid=pkv, build_valid=bkv,
                probe_exists=probe_exists, build_exists=build_exists)
    r = jnp.arange(cand.probe_idx.shape[0])
    pair_ok = r < cand.count
    pidx = jnp.clip(cand.probe_idx, 0, np_ - 1)
    bidx = jnp.clip(cand.build_idx, 0, nb - 1)
    from ..utils.bits import gather32
    match = pair_ok
    for i in range(1, k):
        pv = gather32(probe_keys_list[i], pidx)
        bv = gather32(build_keys_list[i], bidx)
        match = match & (pv == bv)

    if how == "inner":
        from .compaction import compact_sort
        idx, count, packed = compact_sort(
            match, [cand.probe_idx, cand.build_idx])
        return JoinResult(packed[0], packed[1], count, cand.overflow)

    # probe-level composite-match flags (scatter-or over candidate pairs)
    n1 = np_ + 1
    hit = jnp.zeros((n1,), dtype=jnp.int32).at[
        jnp.where(match, pidx, np_)].max(1, mode="drop")[:np_] > 0
    exists = probe_exists if probe_exists is not None \
        else jnp.ones((np_,), dtype=bool)

    if how in ("right", "full"):
        from .compaction import compact_sort
        C = cand.probe_idx.shape[0]
        _, mcount, mpacked = compact_sort(match,
                                          [cand.probe_idx, cand.build_idx])
        probe_out, build_out = mpacked[0], mpacked[1]
        total = mcount
        if how == "full":
            un_p = (~hit) & exists
            uidx, ucount, _ = compact_sort(un_p)
            r2 = jnp.arange(np_)
            slot = jnp.where(r2 < ucount, r2 + total, C)
            probe_out = jnp.concatenate(
                [probe_out, jnp.zeros((1,), probe_out.dtype)]).at[slot].set(
                    uidx.astype(probe_out.dtype), mode="drop")[:C]
            build_out = jnp.concatenate(
                [build_out, jnp.zeros((1,), build_out.dtype)]).at[slot].set(
                    -1, mode="drop")[:C]
            total = total + ucount
        # build-level composite-match flags → unmatched build rows
        bexists = build_exists if build_exists is not None \
            else jnp.ones((nb,), dtype=bool)
        bhit = jnp.zeros((nb + 1,), dtype=jnp.int32).at[
            jnp.where(match, bidx, nb)].max(1, mode="drop")[:nb] > 0
        un_b = (~bhit) & bexists
        bids, bcount, _ = compact_sort(un_b)
        r3 = jnp.arange(nb)
        slot = jnp.where(r3 < bcount, r3 + total, C)
        probe_out = jnp.concatenate(
            [probe_out, jnp.zeros((1,), probe_out.dtype)]).at[slot].set(
                -1, mode="drop")[:C]
        build_out = jnp.concatenate(
            [build_out, jnp.zeros((1,), build_out.dtype)]).at[slot].set(
                bids.astype(build_out.dtype), mode="drop")[:C]
        total = total + bcount
        return JoinResult(probe_out, build_out,
                          jnp.minimum(total, C).astype(jnp.int32),
                          cand.overflow | (total > C))
    if how == "semi":
        from .compaction import compact_sort
        sel = hit & exists
        idx, count, _ = compact_sort(sel)
        return JoinResult(idx.astype(jnp.int32),
                          jnp.full((np_,), -1, jnp.int32)[:idx.shape[0]],
                          count, cand.overflow)
    if how == "anti":
        from .compaction import compact_sort
        sel = (~hit) & exists
        idx, count, _ = compact_sort(sel)
        return JoinResult(idx.astype(jnp.int32),
                          jnp.full((np_,), -1, jnp.int32)[:idx.shape[0]],
                          count, cand.overflow)
    # left: matched pairs + unmatched probe rows with null build
    from .compaction import compact_sort
    midx, mcount, mpacked = compact_sort(match,
                                         [cand.probe_idx, cand.build_idx])
    un = (~hit) & exists
    uidx, ucount, _ = compact_sort(un)       # [np_]
    C = cand.probe_idx.shape[0]
    # append unmatched rows after the matched pairs (uidx is probe-length)
    r2 = jnp.arange(np_)
    slot = jnp.where(r2 < ucount, r2 + mcount, C)
    probe_out = jnp.concatenate(
        [mpacked[0], jnp.zeros((1,), mpacked[0].dtype)]).at[slot].set(
            uidx.astype(mpacked[0].dtype), mode="drop")[:C]
    build_out = jnp.concatenate(
        [mpacked[1], jnp.zeros((1,), mpacked[1].dtype)]).at[slot].set(
            -1, mode="drop")[:C]
    total = mcount + ucount
    return JoinResult(probe_out, build_out, total.astype(jnp.int32),
                      cand.overflow | (total > C))


def _hash_probe_ranges(pk_norm, sorted_norm, n_valid, probe_kv,
                       perm=None, table_factor: int = 16):
    """Back-compat composition of _build_ranges_table + _probe_ranges_table
    (the r5 build/probe split). Returns (start, len, all_unique)."""
    table, all_unique = _build_ranges_table(sorted_norm, n_valid, perm,
                                            table_factor)
    start, ln, _ = _probe_ranges_table(table, sorted_norm.shape[0],
                                       pk_norm, probe_kv)
    if perm is None:
        all_unique = jnp.zeros((), bool)
    return start, ln, all_unique


def _build_ranges_table(sorted_norm, n_valid, perm=None,
                        table_factor: int = 16):
    """Build the duplicate-run hash table over the SORTED normalized build
    keys — the Make half of the general-join probe.

    Detect run starts in the sorted keys (duplicates are contiguous),
    compute run lengths via a suffix-min of start positions, then place one
    (key limbs, start, len) entry per run into a LINEAR-probed table — with
    a CLOSED-FORM placement instead of iterated claim/re-read scatter
    rounds: sort the runs by home slot h_i, then first-fit linear probing
    admits the classic parking-function scan ``pos_i = i + cummax(h_i - i)``
    (if the previous entry pushed past our home we take the next slot, else
    we sit at home). Every pos is final, strictly increasing, and written
    with ONE sorted-unique scatter.

    When ``perm`` is given (sorted-order → original row permutation),
    LENGTH-1 runs store the ORIGINAL build row index in the start field
    instead of the sorted position (length > 1 runs keep sorted
    positions); callers branch per-row on len == 1, and on the returned
    ``all_unique`` flag (lax.cond) to skip the run expansion entirely
    (the PK-FK common case).

    Returns (table int32[T + nb, 4], all_unique).
    """
    from ..utils.bits import split_i64
    from ..utils.hashing import hash32
    from .groupby import table_size_for

    nb = sorted_norm.shape[0]
    # widen small tables: higher factors cut both chain incidence and
    # chain length (round-1 resolution ~97% at 32, ~98.5% at 64) — but each
    # slot is 4×i32 = 16 B, so cap the widened table by ACTUAL bytes
    # (ADVICE r4: the old "≤512 MB" comment undercounted 4×): factor halves
    # until (T + nb slack)·16 B fits ~1.5 GiB (<10% of v5e HBM, leaving
    # room for a 100M-row probe + index outputs alongside).
    if nb <= (1 << 21):
        table_factor = max(table_factor, 64)
    elif nb <= (1 << 22):
        table_factor = max(table_factor, 32)
    budget = 1536 << 20
    while table_factor > 4 and \
            (table_size_for(nb, table_factor) + nb) * 16 > budget:
        table_factor //= 2
    T = table_size_for(nb, table_factor)
    # slack tail: worst-case first-fit overhang is < nb slots past the
    # last home slot
    T_tot = T + nb
    sk64 = sorted_norm.astype(jnp.int64)
    slo, shi = split_i64(sk64)
    slo_i, shi_i = slo.view(jnp.int32), shi.view(jnp.int32)
    iota = jnp.arange(nb, dtype=jnp.int32)
    valid = iota < n_valid
    prev_ne = jnp.concatenate([jnp.ones((1,), bool), sk64[1:] != sk64[:-1]])
    is_start = valid & prev_ne
    # strictly-next start position via reversed cummin, shifted one left;
    # clamp to the valid prefix (a valid max-key run merges into the pinned
    # sentinel tail — the clamp cuts it back)
    start_pos = jnp.where(is_start, iota, jnp.int32(nb))
    nxt = lax.cummin(start_pos[::-1])[::-1]
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), nb, jnp.int32)])
    # n_valid may arrive as a traced int64 scalar under x64; pin i32 so the
    # stacked table rows stay i32 (an i64 row would FutureWarning — and soon
    # error — on the .at[].set scatter into the i32 table)
    run_len = (jnp.minimum(nxt, jnp.asarray(n_valid).astype(jnp.int32))
               - iota)                               # ≥ 1 at start rows

    all_unique = ~jnp.any(is_start & (run_len > 1))
    if perm is not None:
        # length-1 runs store the ORIGINAL build row (perm[sorted_pos]) —
        # per-row, so the general expansion stays correct on mixed
        # workloads: it reads start directly when len == 1 and
        # perm[start + j] otherwise
        start_field = jnp.where(run_len == 1, perm.astype(jnp.int32), iota)
    else:
        start_field = iota
        all_unique = jnp.zeros((), bool)

    h0 = (hash32(sk64) % jnp.uint32(T)).astype(jnp.int32)
    rows = jnp.stack([slo_i, shi_i, start_field, run_len], axis=1)

    # ---- closed-form first-fit placement ----
    from .sort import sort_permutation

    h_key = jnp.where(is_start, h0, jnp.int32(T_tot))  # non-starts sort last
    order = sort_permutation([SortKey(h_key)])
    hs = h_key[order]
    pos = iota + lax.cummax(hs - iota)                # first-fit slot per run
    # pos is STRICTLY increasing over all rows (i strictly increasing +
    # nondecreasing cummax); non-starts inherit the sentinel
    # (hs - iota ≥ T_tot - i ⇒ pos ≥ T_tot ⇒ out of bounds ⇒ dropped), and
    # start rows fit below T_tot (homes ≤ T - 1, overhang < nb ≤ slack)
    table = jnp.zeros((T_tot, 4), dtype=jnp.int32)    # (lo, hi, start, len)
    table = table.at[pos].set(
        rows[order], mode="drop", indices_are_sorted=True,
        unique_indices=True)
    return table, all_unique


_HOT_MIN_ROWS = 1 << 22      # hot-key machinery pays off only at scale


def _probe_ranges_table(table, nb: int, pk_norm, probe_kv,
                        hot_k: int = 128, hot_min_rows: int = _HOT_MIN_ROWS):
    """Resolve each probe key to its duplicate-run (start, len) against a
    table from _build_ranges_table — the Evaluate half.

    Two regimes (r5 — VERDICT r4 #1, the join-perf round):
    - large probes take the HOT-KEY path (_probe_ranges_hot): a sampled
      top-``hot_k`` key cache resolves skewed probes by broadcast compare
      (~0.7 ns/row per 64 keys on v5e) with NO table gather, and only the
      cold residue pays the 16-byte random gather — at Zipf(1.3) that cuts
      gathered rows ~4x (the r4 full-width round-1 gather alone was
      7.3 ns/row of the 16.5 ns/row total);
    - small probes keep the dense path (_probe_ranges_dense): full-width
      round-1 gather + compacted chain walk.

    Returns (start, len) — len 0 for absent/invalid keys.
    """
    np_ = pk_norm.shape[0]
    if hot_k > 0 and np_ >= hot_min_rows:
        return _probe_ranges_hot(table, nb, pk_norm, probe_kv, hot_k)
    return _probe_ranges_dense(table, nb, pk_norm, probe_kv)


def probe_diagnostics(jt: JoinTable, probe_keys, probe_valid=None):
    """Residue/fallback counters for one probe chunk (r5, VERDICT r4 weak #7:
    the residue-capacity heuristic is empirical; these counters tell
    operators when it is costing full-width fallback passes). Traceable;
    returns a dict of int32 scalars: residue_rows vs residue_capacity
    (the compacted-walk tier), fallback_rows (> 0 means the heuristic
    overflowed and a full-width walk ran), and on the hot-key path
    hot_rows / walk_rows."""
    np_ = probe_keys.shape[0]
    if probe_valid is None:
        probe_valid = jnp.ones((np_,), bool)
    pk = normalize_key(probe_keys)
    _, _, diag = _probe_ranges_table(jt.table, jt.perm.shape[0], pk,
                                     probe_valid)
    return diag


def _probe_ranges_dense(table, nb: int, pk_norm, probe_kv):
    """Dense probe: one full-width unrolled round-1 gather, then a
    compacted 1/16-width chain walk.

    Each round gathers ONE 16-byte single-slot entry per unresolved
    row — measured 7 ns/row on v5e vs 12 ns for the previous 4-slot 64-byte
    window; at slot load 1/16 (factor 16) chains are almost always length
    1, so the narrow entry wins. An empty slot proves absence (linear
    probing); the probe walks slots un-wrapped into an nb-slot slack tail,
    so pathological all-one-home builds still terminate in-bounds.
    """
    from ..utils.bits import split_i64
    from ..utils.hashing import hash32

    T_tot = table.shape[0]
    T = T_tot - nb
    np_ = pk_norm.shape[0]
    pk64 = pk_norm.astype(jnp.int64)
    plo, phi = split_i64(pk64)
    plo_i, phi_i = plo.view(jnp.int32), phi.view(jnp.int32)
    h0p = (hash32(pk64) % jnp.uint32(T)).astype(jnp.int32)

    # ---- round 1: one unrolled full-width probe --------------------------
    # At slot load 1/16 ~94-97% of probes resolve here (home hit or home
    # empty). The chain-walk continuation must NOT run full-width: a
    # while_loop gathers ALL np rows per round and runs as many rounds as
    # the LONGEST chain (~6 at 1M entries) — 5 wasted full passes
    # (measured 58 ns/row at 100M). Instead the unresolved residue is
    # compacted and walked at 1/8 width, with a full-width fallback loop
    # that executes zero iterations unless the residue overflows the
    # subset capacity (adversarial key sets).
    got = table[jnp.where(probe_kv, h0p, 0)]                 # [np, 4]
    occ = got[:, 3] > 0
    hit = occ & (got[:, 0] == plo_i) & (got[:, 1] == phi_i)
    take = probe_kv & hit
    start = jnp.where(take, got[:, 2], 0)
    ln = jnp.where(take, got[:, 3], 0)
    unresolved = probe_kv & occ & ~hit

    # ---- subset continuation --------------------------------------------
    from .compaction import compact_best

    def _padded_compact(mask):
        from .kernels.compaction_pallas import BLOCK

        n0 = mask.shape[0]
        npad = ((n0 + BLOCK - 1) // BLOCK) * BLOCK
        if npad != n0:
            mask = jnp.concatenate(
                [mask, jnp.zeros((npad - n0,), mask.dtype)])
        return compact_best(mask)

    # residue capacity: unresolved ≈ 1.5-3% at factor 64/32 — np_/16
    # leaves ≥5x margin; overflow falls to the (normally zero-iteration)
    # full-width walk below
    cap = min(np_, max(4096, np_ // 16))
    idx_un, n_un, _ = _padded_compact(unresolved)
    sel = jnp.clip(idx_un[:cap].view(jnp.int32), 0, np_ - 1)
    row_live = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(
        n_un, jnp.int32(cap))
    pos_s = h0p[sel] + 1
    plo_s, phi_s = plo_i[sel], phi_i[sel]
    start_s = jnp.zeros((cap,), jnp.int32)
    ln_s = jnp.zeros((cap,), jnp.int32)

    from ..utils import shard_compat

    def scond(state):
        i, _, _, _, unres = state
        return jnp.logical_and(i < jnp.int32(T_tot), unres.any())

    def sbody(state):
        i, pos, st, l_, unres = state
        g = table[jnp.where(unres, pos, 0)]                  # [cap, 4]
        occ_ = g[:, 3] > 0
        hit_ = occ_ & (g[:, 0] == plo_s) & (g[:, 1] == phi_s)
        tk = unres & hit_
        st = jnp.where(tk, g[:, 2], st)
        l_ = jnp.where(tk, g[:, 3], l_)
        # resolved on hit or empty slot (chain over — absence); chains may
        # extend un-wrapped into the slack tail past T
        return (i + 1, pos + 1, st, l_, unres & occ_ & ~hit_)

    _, _, start_s, ln_s, _ = shard_compat.while_loop(
        scond, sbody, (jnp.int32(0), pos_s, start_s, ln_s, row_live))
    tgt = jnp.where(row_live, sel, jnp.int32(np_))
    # fresh-zero scatter + select merge: a computed-operand TPU scatter
    # costs ~130 ns/element vs ~4 for a zero-initialized one (r5,
    # scratch/prof_join_r5h.py); scatter targets are unresolved rows whose
    # r1 start/ln are 0, so the covered-mask select reconstructs exactly
    covered = jnp.zeros((np_ + 1,), bool).at[tgt].set(
        True, mode="drop", indices_are_sorted=True)[:np_]
    z_st = jnp.zeros((np_ + 1,), jnp.int32).at[tgt].set(
        start_s, mode="drop", indices_are_sorted=True)[:np_]
    z_ln = jnp.zeros((np_ + 1,), jnp.int32).at[tgt].set(
        ln_s, mode="drop", indices_are_sorted=True)[:np_]
    start = jnp.where(covered, z_st, start)
    ln = jnp.where(covered, z_ln, ln)

    # ---- overflow fallback (unresolved rows beyond cap): full-width walk,
    # zero iterations unless cap overflowed ------------------------------
    unresolved2 = unresolved & ~covered

    def pcond(state):
        i, _, _, _, unres = state
        return jnp.logical_and(i < jnp.int32(T_tot), unres.any())

    def pbody(state):
        i, slot, st, l_, unres = state
        g = table[jnp.where(unres, slot, 0)]                 # [np, 4]
        occ_ = g[:, 3] > 0
        hit_ = occ_ & (g[:, 0] == plo_i) & (g[:, 1] == phi_i)
        tk = unres & hit_
        st = jnp.where(tk, g[:, 2], st)
        l_ = jnp.where(tk, g[:, 3], l_)
        return (i + 1, slot + 1, st, l_, unres & occ_ & ~hit_)

    _, _, start, ln, _ = shard_compat.while_loop(
        pcond, pbody, (jnp.int32(0), h0p + 1, start, ln, unresolved2))
    diag = {"residue_rows": n_un.astype(jnp.int32),
            "residue_capacity": jnp.int32(cap),
            "fallback_rows": jnp.sum(unresolved2.astype(jnp.int32))}
    return start, ln, diag


def _compact_with_payloads(mask, payloads):
    """compact_best with BLOCK-multiple padding (mask + int32 payloads)."""
    from .compaction import compact_best
    from .kernels.compaction_pallas import BLOCK

    n0 = mask.shape[0]
    npad = ((n0 + BLOCK - 1) // BLOCK) * BLOCK
    if npad != n0:
        pad = npad - n0
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
        payloads = [jnp.concatenate([p, jnp.zeros((pad,), p.dtype)])
                    for p in payloads]
    return compact_best(mask, payloads)


def _probe_ranges_hot(table, nb: int, pk_norm, probe_kv, K: int):
    """Hot-key probe (r5): resolve the top-K sampled probe keys by
    broadcast compare against a register-resident key cache — no gather —
    and only the cold residue through the table.

    1. A 64k strided sample is sorted; run lengths rank the keys; top-K
       with sample count ≥ 4 form the hot set (≈ keys above ~0.006% row
       share — each saves ≥ 6k gathers at 100M rows). Detection costs
       ~0.3 ns/row; correctness never depends on the choice (hot keys are
       verified by exact 64-bit compare, everything else goes to the
       table).
    2. The K hot keys resolve their (start, len) with one K-wide chain
       walk (trivial).
    3. Full-width broadcast: 64 keys per fused pass (measured 0.66 ns/row
       per 64-key pass; a single [np, 128] formulation costs 5x — XLA's
       fusion degrades past 64 lanes). len+1 encoding distinguishes
       "hot but absent from build" (resolves to no-match, still saving the
       gather) from "not hot".
    4. Cold rows compact (with key-limb + home-slot payloads) to a np/4
       subset: round-1 gather at quarter width, then a second-tier
       compacted chain walk, then ONE sorted scatter per output back to
       full width.
    5. Capacity overflows (cold > np/4 on low-skew data, or residue >
       tier-2 cap) fall to a full-width walk from the home slot — zero
       iterations unless an overflow actually happened, and the np-wide
       rank cumsums that locate the overflowed rows run under a lax.cond
       so the normal path never pays them.
    """
    from ..utils.bits import split_i64
    from ..utils.hashing import hash32
    from ..utils import shard_compat

    T_tot = table.shape[0]
    T = T_tot - nb
    np_ = pk_norm.shape[0]
    pk64 = pk_norm.astype(jnp.int64)
    plo, phi = split_i64(pk64)
    plo_i, phi_i = plo.view(jnp.int32), phi.view(jnp.int32)
    h0p = (hash32(pk64) % jnp.uint32(T)).astype(jnp.int32)
    I64MAX = jnp.int64(2 ** 63 - 1)

    # ---- 1. sampled hot-key detection -----------------------------------
    m = min(65536, np_)
    stride = np_ // m
    samp = jnp.where(probe_kv[::stride][:m], pk64[::stride][:m], I64MAX)
    ss = lax.sort(samp)
    first = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
    iota_s = jnp.arange(m, dtype=jnp.int32)
    sp = jnp.where(first, iota_s, jnp.int32(m))
    nxt = lax.cummin(sp[::-1])[::-1]
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), m, jnp.int32)])
    cnt_s = jnp.where(first & (ss != I64MAX), nxt - iota_s, 0)
    # sort-based top-K, NOT lax.top_k: TopK lowers through a (value, index)
    # pair reduce-window that blows XLA's scoped-vmem budget at some probe
    # shapes ("It should not be possible to run out of scoped vmem",
    # measured r5 at 16M rows); one more 64k sort is ~free
    _, topv, topi = lax.sort((-cnt_s, cnt_s, iota_s), num_keys=1,
                             is_stable=True)
    topv, topi = topv[:K], topi[:K]
    hot64 = ss[topi]
    hot_ok = (topv >= 4) & (hot64 != I64MAX)
    hlo64, hhi64 = split_i64(hot64)
    hlo, hhi = hlo64.view(jnp.int32), hhi64.view(jnp.int32)

    # ---- 2. resolve the hot keys against the table (K-wide walk) --------
    hh = (hash32(hot64) % jnp.uint32(T)).astype(jnp.int32)

    def hcond(s):
        return jnp.logical_and(s[0] < jnp.int32(T_tot), s[4].any())

    def hbody(s):
        i, pos, st, l_, un = s
        g = table[jnp.where(un, pos, 0)]
        occ = g[:, 3] > 0
        hit = occ & (g[:, 0] == hlo) & (g[:, 1] == hhi)
        tk = un & hit
        return (i + 1, pos + 1, jnp.where(tk, g[:, 2], st),
                jnp.where(tk, g[:, 3], l_), un & occ & ~hit)

    _, _, h_start, h_len, _ = shard_compat.while_loop(
        hcond, hbody, (jnp.int32(0), hh, jnp.zeros((K,), jnp.int32),
                       jnp.zeros((K,), jnp.int32), hot_ok))
    h_lnp1 = jnp.where(hot_ok, h_len + 1, 0)

    # ---- 3. full-width broadcast resolve, 64 keys per fused pass --------
    # extraction via an MXU matmul of the 0/1 eq matrix against the [K, 2]
    # (start, len+1) value matrix where exact — f32 integers are exact
    # below 2^24, and both fields are bounded by nb (measured 0.42 vs 0.66
    # ns/row per 64-key pass for the select+reduce formulation; a single
    # [np, 128] pass costs 5x either way, so keys chunk by 64)
    use_mxu = nb < (1 << 24)
    if use_mxu:
        vals2 = jnp.stack([h_start, h_lnp1], axis=1).astype(jnp.float32)
        acc = jnp.zeros((np_, 2), jnp.float32)
        for c in range(0, K, 64):
            sl = slice(c, min(c + 64, K))
            eq = ((plo_i[:, None] == hlo[None, sl])
                  & (phi_i[:, None] == hhi[None, sl])).astype(jnp.float32)
            acc = acc + eq @ vals2[sl]
        st_hot = acc[:, 0].astype(jnp.int32)
        lnp1 = acc[:, 1].astype(jnp.int32)
    else:
        st_hot = jnp.zeros((np_,), jnp.int32)
        lnp1 = jnp.zeros((np_,), jnp.int32)
        for c in range(0, K, 64):
            sl = slice(c, min(c + 64, K))
            eq = (plo_i[:, None] == hlo[None, sl]) \
                & (phi_i[:, None] == hhi[None, sl])
            st_hot = st_hot + jnp.sum(
                jnp.where(eq, h_start[None, sl], 0), axis=1)
            lnp1 = lnp1 + jnp.sum(jnp.where(eq, h_lnp1[None, sl], 0),
                                  axis=1)
    is_hot = lnp1 > 0
    start = jnp.where(is_hot, st_hot, 0)
    ln = jnp.where(is_hot, lnp1 - 1, 0)

    # ---- 4. cold tier: compacted round-1 + second-tier chain walk -------
    cold = probe_kv & ~is_hot
    C1 = min(np_, max(8192, np_ // 4))
    # carry only the key limbs; the home slot recomputes from them on the
    # subset (hash is cheaper at np/4 width than one more full-width
    # compaction lane)
    idx1, n1, packed1 = _compact_with_payloads(cold, [plo_i, phi_i])
    live1 = jnp.arange(C1, dtype=jnp.int32) < jnp.minimum(
        n1, jnp.int32(C1))
    sel1 = jnp.clip(idx1[:C1].view(jnp.int32), 0, np_ - 1)
    plo_s = packed1[0][:C1].view(jnp.int32)
    phi_s = packed1[1][:C1].view(jnp.int32)
    from ..utils.bits import combine_i64
    pk64_s = combine_i64(plo_s.view(jnp.uint32), phi_s.view(jnp.uint32),
                         jnp.int64)
    h0p_s = (hash32(pk64_s) % jnp.uint32(T)).astype(jnp.int32)

    got = table[jnp.where(live1, h0p_s, 0)]
    occ = got[:, 3] > 0
    hit = occ & (got[:, 0] == plo_s) & (got[:, 1] == phi_s)
    tk1 = live1 & hit
    start_s = jnp.where(tk1, got[:, 2], 0)
    ln_s = jnp.where(tk1, got[:, 3], 0)
    unres_s = live1 & occ & ~hit

    C2 = min(C1, max(4096, C1 // 8))
    idx2, n2, packed2 = _compact_with_payloads(
        unres_s, [h0p_s + 1, plo_s, phi_s])
    live2 = jnp.arange(C2, dtype=jnp.int32) < jnp.minimum(
        n2, jnp.int32(C2))
    sel2 = jnp.clip(idx2[:C2].view(jnp.int32), 0, C1 - 1)
    pos_w = packed2[0][:C2].view(jnp.int32)
    plo_w = packed2[1][:C2].view(jnp.int32)
    phi_w = packed2[2][:C2].view(jnp.int32)

    def wcond(s):
        return jnp.logical_and(s[0] < jnp.int32(T_tot), s[4].any())

    def wbody(s):
        i, pos, st, l_, un = s
        g = table[jnp.where(un, pos, 0)]
        occ_ = g[:, 3] > 0
        hit_ = occ_ & (g[:, 0] == plo_w) & (g[:, 1] == phi_w)
        tk = un & hit_
        return (i + 1, pos + 1, jnp.where(tk, g[:, 2], st),
                jnp.where(tk, g[:, 3], l_), un & occ_ & ~hit_)

    _, _, st_w, ln_w, _ = shard_compat.while_loop(
        wcond, wbody, (jnp.int32(0), pos_w, jnp.zeros((C2,), jnp.int32),
                       jnp.zeros((C2,), jnp.int32), live2))
    # ALL scatters below write into FRESH ZERO operands and merge with a
    # select: a TPU scatter whose operand is a computed array lowers to a
    # ~130 ns/element path regardless of sorted/unique flags or
    # optimization barriers, while a zero-initialized operand scatters at
    # ~4 ns/element (measured r5, scratch/prof_join_r5h.py — 30x).
    tgt2 = jnp.where(live2, sel2, jnp.int32(C1))
    z_st = jnp.zeros((C1 + 1,), jnp.int32).at[tgt2].set(
        st_w, mode="drop", indices_are_sorted=True)[:C1]
    z_ln = jnp.zeros((C1 + 1,), jnp.int32).at[tgt2].set(
        ln_w, mode="drop", indices_are_sorted=True)[:C1]
    z_w = jnp.zeros((C1 + 1,), bool).at[tgt2].set(
        live2, mode="drop", indices_are_sorted=True)[:C1]
    start_s = jnp.where(z_w, z_st, start_s)
    ln_s = jnp.where(z_w, z_ln, ln_s)

    # ---- 5. scatter the cold subset to full width (fresh zeros), then
    # merge: scatter targets are exactly the compacted cold rows, whose
    # pre-merge start/ln are 0 — so select on the hot mask reconstructs
    # the full-width answer without a read-modify-write scatter ----------
    tgt1 = jnp.where(live1, sel1, jnp.int32(np_))
    f_st = jnp.zeros((np_ + 1,), jnp.int32).at[tgt1].set(
        start_s, mode="drop", indices_are_sorted=True)[:np_]
    f_ln = jnp.zeros((np_ + 1,), jnp.int32).at[tgt1].set(
        ln_s, mode="drop", indices_are_sorted=True)[:np_]
    start = jnp.where(is_hot, start, f_st)
    ln = jnp.where(is_hot, ln, f_ln)

    # ---- 6. overflow fallback: full-width walk from home ----------------
    overflowed = (n1 > jnp.int32(C1)) | (n2 > jnp.int32(C2))

    def mk_unres(_):
        rank1 = jnp.cumsum(cold, dtype=jnp.int32)
        un_a = cold & (rank1 > jnp.int32(C1))
        rank2 = jnp.cumsum(unres_s, dtype=jnp.int32)
        un_s_over = unres_s & (rank2 > jnp.int32(C2))
        un_b = jnp.zeros((np_ + 1,), bool).at[tgt1].set(
            un_s_over, mode="drop", indices_are_sorted=True)[:np_]
        return un_a | un_b

    # false branch derives from `cold` so both branches carry the same
    # varying-manual-axes set under shard_map
    unres_full = lax.cond(overflowed, mk_unres, lambda _: cold & ~cold, 0)

    def pcond(s):
        return jnp.logical_and(s[0] < jnp.int32(T_tot), s[4].any())

    def pbody(s):
        i, slot, st, l_, un = s
        g = table[jnp.where(un, slot, 0)]
        occ_ = g[:, 3] > 0
        hit_ = occ_ & (g[:, 0] == plo_i) & (g[:, 1] == phi_i)
        tk = un & hit_
        return (i + 1, slot + 1, jnp.where(tk, g[:, 2], st),
                jnp.where(tk, g[:, 3], l_), un & occ_ & ~hit_)

    _, _, start, ln, _ = shard_compat.while_loop(
        pcond, pbody, (jnp.int32(0), h0p, start, ln, unres_full))
    diag = {"hot_rows": jnp.sum(is_hot.astype(jnp.int64)).astype(jnp.int32),
            "residue_rows": n1.astype(jnp.int32),
            "residue_capacity": jnp.int32(C1),
            "walk_rows": n2.astype(jnp.int32),
            "fallback_rows": jnp.sum(unres_full.astype(jnp.int32))}
    return start, ln, diag


def _hash_probe_unique(probe_keys, build_keys, probe_kv, build_kv):
    """Hash-table probe for UNIQUE build keys: returns (matched, build_idx)
    per probe row.

    The sorted-array probe costs log2(B) dependent int64 gathers per probe
    (~11 s for 16M×1M on v5e); this path costs ~2 rounds of one AoS-row
    gather each. Table rows are (key_lo, key_hi, build_idx, occupied) int32
    so each probe round fetches one contiguous 16-byte entry. Duplicate
    build keys are detected and reported (second return) — results merge
    arbitrarily in that case, callers treat it like capacity overflow.
    """
    from ..utils.bits import split_i64
    from ..utils.hashing import hash32
    from .groupby import table_size_for

    nb = build_keys.shape[0]
    np_ = probe_keys.shape[0]
    T = table_size_for(nb, 4)

    bk64 = build_keys.astype(jnp.int64)
    blo, bhi = split_i64(bk64)
    # double hashing (odd stride) — see _hash_probe_ranges
    h0b = (hash32(bk64) % jnp.uint32(T)).astype(jnp.int32)
    step_b = ((hash32(bk64, jnp.uint32(0x9E37)) % jnp.uint32(T))
              | jnp.uint32(1)).astype(jnp.int32)

    table = jnp.zeros((T + 1, 4), dtype=jnp.int32)

    def bcond(state):
        i, _, _, unresolved = state
        return jnp.logical_and(i < T, unresolved.any())

    def bbody(state):
        i, pos, table, unresolved = state
        slot = jnp.where(unresolved, pos, T)
        occ = table[slot, 3] > 0
        claim = unresolved & ~occ
        cslot = jnp.where(claim, slot, T)
        rows = jnp.stack([blo.view(jnp.int32), bhi.view(jnp.int32),
                          jnp.arange(nb, dtype=jnp.int32),
                          jnp.ones((nb,), jnp.int32)], axis=1)
        table = table.at[cslot].set(rows, mode="drop")
        got = table[slot]
        settled = unresolved & (got[:, 3] > 0) \
            & (got[:, 0] == blo.view(jnp.int32)) \
            & (got[:, 1] == bhi.view(jnp.int32))
        return (i + 1, (pos + step_b) % T, table, unresolved & ~settled)

    from ..utils import shard_compat

    init = (jnp.int32(0), h0b, table, build_kv)
    _, _, table, _ = shard_compat.while_loop(bcond, bbody, init)
    n_filled = jnp.sum((table[:T, 3] > 0).astype(jnp.int32))
    dup = n_filled < jnp.sum(build_kv.astype(jnp.int32))

    pk64 = probe_keys.astype(jnp.int64)
    plo, phi = split_i64(pk64)
    plo_i, phi_i = plo.view(jnp.int32), phi.view(jnp.int32)
    h0p = (hash32(pk64) % jnp.uint32(T)).astype(jnp.int32)
    step_p = ((hash32(pk64, jnp.uint32(0x9E37)) % jnp.uint32(T))
              | jnp.uint32(1)).astype(jnp.int32)

    def pcond(state):
        i, _, _, _, unresolved = state
        return jnp.logical_and(i < T, unresolved.any())

    def pbody(state):
        i, pos, matched, bidx, unresolved = state
        slot = jnp.where(unresolved, pos, T)
        got = table[slot]
        occ = got[:, 3] > 0
        hit = occ & (got[:, 0] == plo_i) & (got[:, 1] == phi_i)
        matched = matched | (unresolved & hit)
        bidx = jnp.where(unresolved & hit, got[:, 2], bidx)
        # resolved if hit or slot empty (key absent)
        unresolved = unresolved & occ & ~hit
        return (i + 1, (pos + step_p) % T, matched, bidx, unresolved)

    pinit = (jnp.int32(0), h0p, jnp.zeros((np_,), bool),
             jnp.full((np_,), -1, jnp.int32), probe_kv)
    _, _, matched, bidx, _ = shard_compat.while_loop(pcond, pbody, pinit)
    return matched, bidx, dup
