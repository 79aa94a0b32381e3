"""Merge-path sort — O(n log n) large-N replacement for the bitonic network.

Reference behavior: pyarrow.compute.sort_indices (SURVEY.md §2c, BASELINE
configs[2]).  The hybrid bitonic network (sort_bitonic.py) pays
(m-w)(m-w+1)/2 ≈ 80 full HBM passes at 100M rows; this module replaces the
cross-block phases with log2(n/W) *merge rounds*, each a single Pallas
kernel pass:

- **Leaf**: the existing Pallas leaf kernel fully sorts W=32k-row blocks in
  VMEM (one HBM round trip) → n/W sorted runs.
- **Merge round**: pairs of adjacent runs merge via *merge-path
  partitioning*: the output is cut into K-row tiles; a vectorized XLA
  binary search (diagonal search) finds, per tile, exactly which A-segment
  and B-segment produce that tile's K outputs (la + lb = K).  The kernel
  DMAs both segments into VMEM (dynamic element offsets via 1024-aligned
  windows + in-VMEM flat rotation), merges them with Batcher's odd-even
  merge network (log2(2K)+1 = 17 compare-exchange stages, pure VPU
  roll/select — no reversal: odd-even merge takes two ASCENDING inputs,
  unlike the bitonic merge; lax.rev does not lower on Mosaic), and writes
  the K results through a statically-addressed output block.

Total HBM traffic: 1 leaf pass + log2(n/W) merge passes (each ~2× read +
1× write) — ~13 passes at 100M rows vs ~90 for the bitonic network.

Why not radix: measured on v5e (scratch/prof_gather.py), XLA gather/scatter
costs ~12 ns/element regardless of locality (80-130 M/s even for a
256-entry table), so any per-element permutation apply is slower than the
whole merge sort; radix's bucket-scatter has no bulk-DMA formulation that
survives skewed digit distributions.

Key encoding: identical contract to bitonic_sort_u32 — uint32 limb columns,
most significant first, unsigned lex order = row order; limbs bias-flip to
signed int32 (Mosaic has no unsigned vector compares).  The row index rides
as the last *comparator* limb (total order → stability, and the output
permutation).  NEW vs bitonic: extra non-compared *carry* limbs (payload
columns) ride through every round, eliminating the post-sort payload
gather (12 ns/row/limb — the old sort's largest cost at 100M).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort_bitonic import _run_block_stages, _stage_pairs_leaf

LANE = 128
ALIGN = 1024               # HBM DMA element alignment for int32 lanes
DEFAULT_W_LOG2 = 16        # leaf block = merge tile = 65536 rows
#   swept on v5e @100M, 5 limbs: 2^15 → 860 ms, 2^16 → 804 ms (fewer merge
#   rounds beat the longer leaf), 2^17 → compile/VMEM pathology (hang)
_I32_MAX = np.int32(2 ** 31 - 1)


# ---------------------------------------------------------------------------
# in-kernel helpers

def _flat_roll(x, s, rows, dyn: bool = False):
    """out_flat[f] = in_flat[(f + s) mod rows*128] on a [rows, LANE] block.

    A flat rotation is a row roll + a lane roll + a one-row carry for lanes
    that cross a row boundary (verified scratch/probe_mosaic.py)."""
    if not dyn:
        s = int(s) % (rows * LANE)
        rq, rl = divmod(s, LANE)
        if rl == 0:
            if rq == 0:
                return x
            return pltpu.roll(x, jnp.int32((rows - rq) % rows), 0)
        a = pltpu.roll(x, jnp.int32((rows - rq) % rows), 0)
        b = pltpu.roll(x, jnp.int32((rows - rq - 1) % rows), 0)
        li = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        c = jnp.where(li < jnp.int32(rl), b, a)
        return pltpu.roll(c, jnp.int32(LANE - rl), 1)
    rq = s // jnp.int32(LANE)
    rl = s % jnp.int32(LANE)
    a = pltpu.roll(x, (jnp.int32(rows) - rq) % jnp.int32(rows), 0)
    b = pltpu.roll(x, (jnp.int32(rows) - rq - 1) % jnp.int32(rows), 0)
    li = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    c = jnp.where(li < rl, b, a)
    return pltpu.roll(c, (jnp.int32(LANE) - rl) % jnp.int32(LANE), 1)


def _lex_gt_i32(mine: Sequence, partner: Sequence):
    """Strict lex ``mine > partner`` over signed-i32 limbs, in int32 0/1
    arithmetic (Mosaic cannot lower i1-vector-valued selects)."""
    gt = (mine[0] > partner[0]).astype(jnp.int32)
    eq = (mine[0] == partner[0]).astype(jnp.int32)
    for m_, p_ in zip(mine[1:], partner[1:]):
        gt = gt | (eq & (m_ > p_).astype(jnp.int32))
        eq = eq & (m_ == p_).astype(jnp.int32)
    return gt


def _odd_even_merge(vals: List, num_cmp: int, k_log2: int):
    """Batcher odd-even merge of two sorted K-halves laid out flat in
    [2K/128, LANE] blocks.  Stages r = K, K/2, .., 1:
      r == K: compare (i, i+K) for every i < K;
      r <  K: compare (i, i+r) where bit_q(i) == 1 and i < 2K - r
    (network verified against the Batcher recursion in numpy)."""
    K = 1 << k_log2
    n = 2 * K
    rows = n // LANE
    # routing masks stay at [rows, 1] / [1, LANE] shapes wherever the
    # stride allows — bit q of the flat index is a pure row bit for q ≥ 7
    # and a pure lane bit for q < 7 (same trick as _block_kernel; ~25% of
    # merge-round VPU cost)
    r1 = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    c1 = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    # stage r = K: symmetric partner (single roll serves both directions)
    ps = [_flat_roll(v, K, rows) for v in vals]
    gt = _lex_gt_i32(vals[:num_cmp], ps[:num_cmp])
    low = r1 < jnp.int32(rows // 2)                       # [rows, 1]
    swap = (gt > 0) == low
    vals = [jnp.where(swap, p, v) for v, p in zip(vals, ps)]

    for q in range(k_log2 - 1, -1, -1):
        r = 1 << q
        pm = [_flat_roll(v, r, rows) for v in vals]       # in[f + r]
        ph = [_flat_roll(v, -r, rows) for v in vals]      # in[f - r]
        # masks in int32 0/1 arithmetic — a select with i1-vector BRANCH
        # VALUES does not lower ("unsupported target bitwidth for
        # truncation"); bool CONDITIONS selecting int32 are fine
        if q >= 7:
            bq = (r1 >> (q - 7)) & 1                      # [rows, 1]
            flt = (r1 < jnp.int32((n - r) // LANE)).astype(jnp.int32)
            fge = (r1 >= jnp.int32(2 * r // LANE)).astype(jnp.int32)
        else:
            bq = (c1 >> q) & 1                            # [1, LANE]
            # f < n - r  ⟺  not(last row ∧ lane ≥ 128 - r)
            flt = 1 - ((r1 == jnp.int32(rows - 1)).astype(jnp.int32)
                       * (c1 >= jnp.int32(LANE - r)).astype(jnp.int32))
            # f >= 2r  ⟺  row > 0 ∨ lane ≥ 2r (2r ≤ 128)
            fge = jnp.maximum((r1 > 0).astype(jnp.int32),
                              (c1 >= jnp.int32(2 * r)).astype(jnp.int32))
        active = bq * flt + (1 - bq) * fge
        part = [jnp.where(bq > 0, a, b) for a, b in zip(pm, ph)]
        gt = _lex_gt_i32(vals[:num_cmp], part[:num_cmp])
        # low side (bitq=1) swaps on gt, high side on !gt — and only
        # inside the active range
        swap = (gt == bq) & (active > 0)
        vals = [jnp.where(swap, p, v) for v, p in zip(vals, part)]
    return vals


def _merge_kernel(as_ref, la_ref, bs_ref, lb_ref, *refs, num_limbs: int,
                  num_cmp: int, k_log2: int):
    """One grid step: produce one K-row output tile of one run-pair merge.

    as/la/bs/lb_ref (scalar prefetch, SMEM int32 [T] each — a 2-D [T, 4]
    operand lane-pads to [T, 128] and overflows the 1 MB SMEM): per tile
    the global element offsets/lengths (a_start, la, b_start, lb) with
    la + lb = K.  refs: num_limbs HBM inputs [(rows, LANE)], num_limbs
    VMEM out blocks [KR, LANE], scratch: 2*num_limbs windows, DMA sems.
    """
    t = pl.program_id(0)
    K = 1 << k_log2
    KR = K // LANE
    WR = KR + ALIGN // LANE
    ins = refs[:num_limbs]
    outs = refs[num_limbs:2 * num_limbs]
    awin = refs[2 * num_limbs:3 * num_limbs]
    bwin = refs[3 * num_limbs:4 * num_limbs]
    sem = refs[4 * num_limbs]

    a_start = as_ref[t]
    la = la_ref[t]
    b_start = bs_ref[t]
    lb = lb_ref[t]

    arow0 = (a_start // jnp.int32(ALIGN)) * jnp.int32(ALIGN // LANE)
    brow0 = (b_start // jnp.int32(ALIGN)) * jnp.int32(ALIGN // LANE)
    for l in range(num_limbs):
        pltpu.make_async_copy(ins[l].at[pl.ds(arow0, WR)], awin[l],
                              sem.at[jnp.int32(l)]).start()
        pltpu.make_async_copy(ins[l].at[pl.ds(brow0, WR)], bwin[l],
                              sem.at[jnp.int32(num_limbs + l)]).start()
    for l in range(num_limbs):
        pltpu.make_async_copy(ins[l].at[pl.ds(arow0, WR)], awin[l],
                              sem.at[jnp.int32(l)]).wait()
        pltpu.make_async_copy(ins[l].at[pl.ds(brow0, WR)], bwin[l],
                              sem.at[jnp.int32(num_limbs + l)]).wait()

    rot_a = a_start % jnp.int32(ALIGN)
    rot_b = b_start % jnp.int32(ALIGN)
    fw = (lax.broadcasted_iota(jnp.int32, (KR, LANE), 0) * LANE
          + lax.broadcasted_iota(jnp.int32, (KR, LANE), 1))
    vals = []
    for l in range(num_limbs):
        a = _flat_roll(awin[l][...], rot_a, WR, dyn=True)[:KR, :]
        a = jnp.where(fw < la, a, jnp.full_like(a, _I32_MAX))
        b = _flat_roll(bwin[l][...], rot_b, WR, dyn=True)[:KR, :]
        b = jnp.where(fw < lb, b, jnp.full_like(b, _I32_MAX))
        vals.append(jnp.concatenate([a, b], axis=0))

    vals = _odd_even_merge(vals, num_cmp, k_log2)
    for l in range(num_limbs):
        outs[l][...] = vals[l][:KR, :]


def _merge_round(vals: List[jnp.ndarray], meta, num_cmp: int,
                 w_log2: int, interpret: bool) -> List[jnp.ndarray]:
    """Run one merge round: vals are flat [total] int32; meta is int32
    [T, 4] device array. Returns new flat limb arrays (same total length;
    rows beyond the T output tiles are unspecified — callers mask)."""
    total = vals[0].shape[0]
    K = 1 << w_log2
    KR = K // LANE
    WR = KR + ALIGN // LANE
    T = meta.shape[0]
    num_limbs = len(vals)
    rows_total = total // LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_limbs,
        # index-map zeros derive from t so they stay int32 — python-int
        # literals lower as i64, which Mosaic cannot legalize
        out_specs=[pl.BlockSpec((KR, LANE), lambda t, *_: (t, t * 0),
                                memory_space=pltpu.VMEM)] * num_limbs,
        scratch_shapes=([pltpu.VMEM((WR, LANE), jnp.int32)
                         for _ in range(2 * num_limbs)]
                        + [pltpu.SemaphoreType.DMA((2 * num_limbs,))]),
    )
    kernel = functools.partial(_merge_kernel, num_limbs=num_limbs,
                               num_cmp=num_cmp, k_log2=w_log2)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), jnp.int32)
                   for _ in range(num_limbs)],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3],
      *[v.reshape(rows_total, LANE) for v in vals])
    return [o.reshape(total) for o in outs]


# ---------------------------------------------------------------------------
# host/XLA side: run pairing + diagonal searches

def _round_runs(nw: int, w: int, r: int) -> List[Tuple[int, int]]:
    """(start, len) of each sorted run before round r (numpy/static)."""
    lr = w << r
    starts = list(range(0, nw, lr))
    return [(s, min(lr, nw - s)) for s in starts]


def _lex_gt_at(cmp_limbs, ia, ib):
    """Vectorized strict lex compare limbs[ia] > limbs[ib] (XLA side)."""
    gt = jnp.zeros(ia.shape, jnp.bool_)
    eq = jnp.ones(ia.shape, jnp.bool_)
    for l in cmp_limbs:
        a = jnp.take(l, ia, mode="clip")
        b = jnp.take(l, ib, mode="clip")
        gt = gt | (eq & (a > b))
        eq = eq & (a == b)
    return gt


def _diag_search(cmp_limbs, a_base, len_a, b_base, len_b, d, steps: int):
    """Merge-path search: per tile, the number a0 of A-elements among the
    first d outputs of the pair merge (A wins ties, which both matches and
    is subsumed by the in-kernel idx-limb tiebreak: runs are position-
    contiguous, so every A index precedes every B index).

    Unrolled python loop, NOT lax.fori_loop: the loop body touches only
    [T]-sized arrays (T ≈ 3k tiles), so an HLO while pays ~1 ms/iteration
    of loop overhead (31 ms/round measured at 100M) while the unrolled
    straight-line gathers fuse to ~2 ms total."""
    lo = jnp.maximum(jnp.int32(0), d - len_b)
    hi = jnp.minimum(d, len_a)
    for _ in range(steps):
        m = (lo + hi) >> 1
        gt = _lex_gt_at(cmp_limbs, a_base + m, b_base + d - m - 1)
        act = lo < hi
        hi = jnp.where(act & gt, m, hi)
        lo = jnp.where(act & ~gt, m + 1, lo)
    return lo


def _round_meta(vals, num_cmp_tot, nw, w_log2, rnd):
    """Device meta [T, 4] for one merge round (static layout + searches)."""
    w = 1 << w_log2
    runs = _round_runs(nw, w, rnd)
    a_base, len_a, b_base, len_b, d_off, pair_id = [], [], [], [], [], []
    for p in range(0, len(runs), 2):
        sa, la_ = runs[p]
        if p + 1 < len(runs):
            sb, lb_ = runs[p + 1]
        else:
            sb, lb_ = sa + la_, 0
        lp = la_ + lb_
        for dt in range(0, lp, w):
            a_base.append(sa)
            len_a.append(la_)
            b_base.append(sb)
            len_b.append(lb_)
            d_off.append(dt)
            pair_id.append(p)
    a_base = jnp.asarray(np.asarray(a_base, np.int32))
    len_a = jnp.asarray(np.asarray(len_a, np.int32))
    b_base = jnp.asarray(np.asarray(b_base, np.int32))
    len_b = jnp.asarray(np.asarray(len_b, np.int32))
    d = jnp.asarray(np.asarray(d_off, np.int32))
    same_pair = np.asarray(
        [i + 1 < len(pair_id) and pair_id[i + 1] == pair_id[i]
         for i in range(len(pair_id))])
    # search range width ≤ min(lenA, lenB) ≤ the round's run length, so
    # log2(run length) + 1 bisection steps always converge
    steps = w_log2 + rnd + 1
    # the idx limb never decides a search (see _diag_search) — drop it
    a0 = _diag_search(vals[:num_cmp_tot - 1], a_base, len_a, b_base, len_b,
                      d, steps)
    a0_next = jnp.where(jnp.asarray(same_pair),
                        jnp.roll(a0, -1), len_a)
    la = a0_next - a0
    return jnp.stack([a_base + a0, la, b_base + (d - a0),
                      jnp.int32(1 << w_log2) - la], axis=1)


# ---------------------------------------------------------------------------
# public entry

def merge_sort_u32(limbs: Sequence[jnp.ndarray],
                   carry: Sequence[jnp.ndarray] = (),
                   w_log2: int = DEFAULT_W_LOG2,
                   interpret: bool = False):
    """Stable ascending sort by lexicographic uint32 comparator limbs, with
    optional non-compared carry (payload) limbs riding the permutation.

    Returns (perm int32[N], sorted comparator limbs, sorted carry limbs).
    Same comparator contract as bitonic_sort_u32; carries are new.
    """
    n = int(limbs[0].shape[0])
    # VMEM guard: windows (2·(K+ALIGN)) + out block (K) + merge temporaries
    # (vals + two partner arrays ≈ 6K live int32 lanes) scale LINEARLY with
    # the limb count — ~(9K + 2·ALIGN)·4 B per limb (predicts 17.8 MB for
    # the 15-limb × K=32k case the r4 guard let through; measured crash was
    # "16.29M and limit 16.00M", ADVICE r4). Halve the tile until the
    # estimate fits a 14 MB budget (2 MB headroom for spill/align slop);
    # each halving costs one extra merge round, so ~90 limbs still compile
    # at the 2^12 floor.
    num_limbs_tot = len(limbs) + 1 + len(carry)

    def _vmem_est(wl):
        return num_limbs_tot * (9 * (1 << wl) + 2 * ALIGN) * 4

    while w_log2 > 12 and _vmem_est(w_log2) > 14 * 2 ** 20:
        w_log2 -= 1
    W = 1 << w_log2
    nw = ((n + W - 1) // W) * W
    total = nw + 2 * W          # slack for window DMA overrun
    bias = jnp.uint32(0x8000_0000)

    def to_signed(u):
        return (u.astype(jnp.uint32) ^ bias).view(jnp.int32)

    idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    vals = [to_signed(x) for x in limbs] + [idx] \
        + [to_signed(c) for c in carry]
    num_cmp_tot = len(limbs) + 1
    pad = total - n
    vals = [jnp.concatenate([v, jnp.full((pad,), _I32_MAX, jnp.int32)])
            for v in vals]

    vals = _run_block_stages(vals, _stage_pairs_leaf(w_log2), w_log2,
                             interpret, num_cmp=num_cmp_tot,
                             local_dirs=True)
    rnd = 0
    while (W << rnd) < nw:
        meta = _round_meta(vals, num_cmp_tot, nw, w_log2, rnd)
        vals = _merge_round(vals, meta, num_cmp_tot, w_log2, interpret)
        rnd += 1

    def unbias(v):
        return v[:n].view(jnp.uint32) ^ bias

    perm = vals[num_cmp_tot - 1][:n]
    sorted_limbs = [unbias(v) for v in vals[:len(limbs)]]
    sorted_carry = [unbias(v) for v in vals[num_cmp_tot:]]
    return perm, sorted_limbs, sorted_carry
