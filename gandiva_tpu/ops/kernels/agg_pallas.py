"""Pallas one-pass hash aggregate for low/mid-cardinality GROUP BY.

Replaces the XLA path (ops/hash_aggregate.py) on TPU for integer AND float
values with <=1024 groups: group discovery AND sum/count/min/max accumulate
in a single pass over HBM. Reference behavior: Acero 'aggregate' oracle
(SURVEY.md SS2c, BASELINE configs[1]); the reference Gandiva itself has no
aggregate -- this operator's contract comes from pyarrow.acero.

V2 design (V1 -- a per-group fori over SMEM scalar accumulators -- measured
86.8 Mrows/s, ~0.2% of HBM; the fori serialized G whole-block reductions per
block and every reduction paid a sublane->lane relayout):

- Grid over row blocks of S*128 rows; TPU grid steps run sequentially, so
  the group table and accumulators live in VMEM *outputs* with constant
  index maps (one window for the whole run), initialized at step 0 with two
  vector stores (no scalar-unrolled init).
- The whole block compares against a 128-slot CHUNK of the table at once:
  oh[S, GC, L] = (khi[S,1,L] == tbl_hi[1,GC,1]) & (klo == tbl_lo)
                 & key_valid & (slot < cnt)
  -- no loop over groups, no relayouts. Every aggregate is a masked
  reduction over axes (0, 2) producing a [GC] sublane vector, accumulated
  into rows [c0, c0+GC) of a [Gcap+8, 16-lane] VMEM accumulator. Capacities
  above 128 groups loop over static chunks (r4: the V2 kernel capped at
  128; chunking extends the tier to 1024 at proportional VPU cost, still
  far ahead of the XLA scatter tier's ~8 ns/row/aggregate).
- The slot<cnt mask keeps rows from matching undiscovered (zero-initialized)
  table slots; capacity is STATIC per call (max_groups rounded up to 8),
  so 64-group queries do a fraction of a 1024-group query's VPU work.
- Unmatched keys insert via a masked-vector table write
  (tbl = where(slot_iota == cnt, new_key, tbl)) -- no dynamic stores --
  smallest ENCODED key first, so discovery order is deterministic.
  Insertions are bounded by Gcap over the WHOLE run; steady-state blocks
  never enter the loop. More than Gcap distinct keys sets the overflow
  flag (Status-style error surface, SURVEY.md SS5.3 -- caller falls back).
- INTEGER values, exactness without 64-bit arithmetic (Mosaic has no i64):
  values split into four 16-bit limbs; per-block masked limb sums are
  <= S*128*(2^16-1) < 2^31 (S <= 64), accumulated into (lo, carry) i32
  pairs with unsigned-wrap carry detection -- exact int64 sums (mod 2^64)
  for any row count. Min/max compare as (signed hi, bias-flipped lo)
  pairs, lexicographically, all as [GC]-vector updates.
- FLOAT values (r4): the caller encodes each float column as order-
  preserving normalized limb planes (ops/sort.normalize_key per plane:
  f64 -> (hi=f32(x), lo=f32(x-hi)) double-float planes; f32 -> one plane).
  Min/max then ride the SAME lexicographic limb compare as integers. For
  sums the kernel inverts the normalization in-register (bit flip +
  pltpu.bitcast) to recover the f32 planes and accumulates each plane with
  a compensated TwoSum pair -- f64-class precision across blocks, f32-tree
  precision within a block (~1e-7 relative on uniform data; floats are
  order-dependent in Arrow too, so the oracle comparison is rtol-based).
- Null-key rows (SQL: nulls form their own group) accumulate into reserved
  accumulator row Gcap through the same vector machinery ([1,1] partials),
  replacing the V2 SMEM scalar side-path (which could not express float
  compensation).

Empty-group identities match ops/hash_aggregate.segment_reduce: sum/count
0, min int64::max, max int64::min (the lane init values decode to exactly
these; float decode swaps identities on count==0 in the caller).

Accumulator lane layout per value column (acc[Gcap+8, 16] i32):
  integer spec:
    0/1   count_all  (lo, carry)
    2/3   count_valid (lo, carry)
    4..11 sum 16-bit limb k -> lanes (4+2k, 5+2k) as (lo, carry)
    12/13 min (hi signed, lo bias-flipped)
    14/15 max (hi signed, lo bias-flipped)
  float spec: same except sum lanes hold f32 bit patterns:
    4/5   hi-plane (sum, compensation)
    6/7   lo-plane (sum, compensation)
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
G = 1024                     # MAX group-table capacity (r4: was 128)
GC = 128                     # table chunk compared per vector pass
# numpy scalars, not jnp: jnp constants at module scope become concrete
# device arrays that pallas_call would treat as captured consts
I32MAX = np.int32(2**31 - 1)
I32MIN = np.int32(-2**31)

_NLANES = 16


class ValueSpec(NamedTuple):
    """Static per-value-column config."""
    want_sum: bool = True
    want_minmax: bool = True
    has_valid: bool = False
    is_float: bool = False     # limbs are normalized float planes


def capacity_for(max_groups: int) -> int:
    """Static table capacity: max_groups rounded up to a sublane multiple."""
    return min(G, max(8, -(-max_groups // 8) * 8))


def _choose_rows(n):
    """Sublanes per block: S*128-row blocks; S=64 keeps the per-block masked
    limb sums < 2^31 (exactness) and the [S,GC,L] intermediates ~<=4 MB."""
    for s in (64, 32, 16, 8):
        if n >= s * LANE:
            return s
    return 8


def _scalar_sum(x):
    """Exact i32 scalar sum of an [S, L] i32 tile whose per-row totals stay
    < 2^31. Lane axis first, then a [S]->[1,S] reshape -- the one scalar-
    reduce shape Mosaic reliably lowers (axis-0-first variants crash
    ApplyVectorLayout inside scf.while). dtype pinned everywhere: under x64
    jnp.sum promotes i32 -> i64, which Mosaic cannot lower; scalar-OUTPUT
    reduce primitives also hit a Mosaic proxy that re-reduces without the
    pin, so every reduction keeps one axis and extracts [0]."""
    r = jnp.sum(x, axis=1, dtype=jnp.int32)                  # [S]
    return jnp.sum(r.reshape(1, -1), axis=1, dtype=jnp.int32)[0]


def _scalar_min(x):
    r = jnp.min(x, axis=1)
    return jnp.min(r.reshape(1, -1), axis=1)[0]


def _limbs16(vlo, vhi):
    """[S,L] i32 limb pair -> four [S,L] 16-bit limb planes (i32)."""
    M16 = jnp.int32(0xFFFF)
    s16 = jnp.int32(16)
    return (vlo & M16, lax.shift_right_logical(vlo, s16),
            vhi & M16, lax.shift_right_logical(vhi, s16))


def _inv_norm_plane(bits_i32):
    """Invert ops/sort._norm_f32 on an i32 bit-plane -> f32 values.
    norm: b&sign ? ~b : b|sign;  inverse: n&sign ? n^sign : ~n."""
    neg = bits_i32 < 0                      # sign bit set
    orig = jnp.where(neg, bits_i32 ^ I32MIN, ~bits_i32)
    return pltpu.bitcast(orig, jnp.float32)


def _kernel(kv_ref, klo_ref, khi_ref, *refs,
            num_values: int, specs: Tuple[ValueSpec, ...], S: int,
            Gcap: int, has_null_path: bool, nb: int):
    nv = num_values
    # remaining input refs: per value (vlo, vhi[, vvalid])
    vrefs = []
    p = 0
    for s in specs:
        k = 3 if s.has_valid else 2
        vrefs.append(refs[p:p + k])
        p += k
    tbl_ref = refs[p]                                # VMEM [Gcap, LANE]
    meta_ref = refs[p + 1]                           # SMEM [8]
    acc_refs = refs[p + 2:p + 2 + nv]                # VMEM [Gcap+8, LANE]
    matched_ref = refs[p + 2 + nv]                   # VMEM [S, LANE] scratch

    GN = Gcap + 8
    lane2 = lax.broadcasted_iota(jnp.int32, (GN, LANE), 1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        meta_ref[0] = jnp.int32(0)
        meta_ref[1] = jnp.int32(0)
        init = jnp.where((lane2 == 12) | (lane2 == 13), I32MAX,
                         jnp.where((lane2 == 14) | (lane2 == 15), I32MIN,
                                   jnp.int32(0)))
        for v in range(nv):
            acc_refs[v][...] = init
        tbl_ref[...] = jnp.zeros((Gcap, LANE), jnp.int32)

    kv = kv_ref[...]                                 # [S,L] 0/1/2 code
    klo = klo_ref[...]
    khi = khi_ref[...]
    km = kv == 1                                     # bool [S,L]
    km3 = km.reshape(S, 1, LANE)
    klo3 = klo.reshape(S, 1, LANE)
    khi3 = khi.reshape(S, 1, LANE)

    vals = []                                        # per value: [S,L] arrays
    for v, s in enumerate(specs):
        vlo = vrefs[v][0][...]
        vhi = vrefs[v][1][...]
        vv = (vrefs[v][2][...] != 0) if s.has_valid else None
        vals.append((vlo, vhi, vv))

    # ---- 64-bit (lo, carry) vector accumulate into acc lanes -------------
    def _acc64v(acc, r0, nr, lane, pcol):
        """pcol: [nr, 1] i32 >= 0 partial; rows [r0, r0+nr), lanes
        (lane, lane+1)."""
        old = acc[r0:r0 + nr, lane:lane + 1]
        new = old + pcol
        carry = (new.astype(jnp.uint32) < pcol.astype(jnp.uint32))
        acc[r0:r0 + nr, lane:lane + 1] = new
        acc[r0:r0 + nr, lane + 1:lane + 2] = \
            acc[r0:r0 + nr, lane + 1:lane + 2] + carry.astype(jnp.int32)

    def _accf32v(acc, r0, nr, lane, pcol):
        """Compensated f32 accumulate: pcol [nr,1] f32 block partial into
        bit-pattern lanes (sum, comp) via TwoSum."""
        s0 = pltpu.bitcast(acc[r0:r0 + nr, lane:lane + 1], jnp.float32)
        c0 = pltpu.bitcast(acc[r0:r0 + nr, lane + 1:lane + 2], jnp.float32)
        t = s0 + pcol
        bp = t - s0
        e = (s0 - (t - bp)) + (pcol - bp)
        acc[r0:r0 + nr, lane:lane + 1] = pltpu.bitcast(t, jnp.int32)
        acc[r0:r0 + nr, lane + 1:lane + 2] = \
            pltpu.bitcast(c0 + e, jnp.int32)

    def _rsum3(x, nr):
        """[S,nr,L] i32 -> [nr,1]: leading axis first, then lanes."""
        t = jnp.sum(x, axis=0, dtype=jnp.int32)             # [nr,L]
        return jnp.sum(t, axis=1, dtype=jnp.int32).reshape(nr, 1)

    def _rsumf3(x, nr):
        t = jnp.sum(x, axis=0, dtype=jnp.float32)
        return jnp.sum(t, axis=1, dtype=jnp.float32).reshape(nr, 1)

    def _rmin3(x, nr):
        t = jnp.min(x, axis=0)
        return jnp.min(t, axis=1).reshape(nr, 1)

    def _rmax3(x, nr):
        t = jnp.max(x, axis=0)
        return jnp.max(t, axis=1).reshape(nr, 1)

    def _update_minmax(acc, r0, nr, oh3, vhi3, vlo_b3):
        """Lexicographic (hi, biased lo) min into lanes 12/13, max 14/15."""
        bh = _rmin3(jnp.where(oh3, vhi3, I32MAX), nr)        # [nr,1]
        bh3 = bh.reshape(1, nr, 1)
        bl = _rmin3(jnp.where(oh3 & (vhi3 == bh3), vlo_b3, I32MAX), nr)
        ch = acc[r0:r0 + nr, 12:13]
        cl = acc[r0:r0 + nr, 13:14]
        better = (bh < ch) | ((bh == ch) & (bl < cl))
        acc[r0:r0 + nr, 12:13] = jnp.where(better, bh, ch)
        acc[r0:r0 + nr, 13:14] = jnp.where(better, bl, cl)
        xh = _rmax3(jnp.where(oh3, vhi3, I32MIN), nr)
        xh3 = xh.reshape(1, nr, 1)
        xl = _rmax3(jnp.where(oh3 & (vhi3 == xh3), vlo_b3, I32MIN), nr)
        ch = acc[r0:r0 + nr, 14:15]
        cl = acc[r0:r0 + nr, 15:16]
        better = (xh > ch) | ((xh == ch) & (xl > cl))
        acc[r0:r0 + nr, 14:15] = jnp.where(better, xh, ch)
        acc[r0:r0 + nr, 15:16] = jnp.where(better, xl, cl)

    def _accumulate3(oh3, r0, nr):
        """Vector accumulation of membership oh3 [S,nr,L] into acc rows
        [r0, r0+nr)."""
        for v, s in enumerate(specs):
            acc = acc_refs[v]
            vlo, vhi, vv = vals[v]
            cp = _rsum3(oh3.astype(jnp.int32), nr)
            _acc64v(acc, r0, nr, 0, cp)
            if vv is not None:
                ohv = oh3 & vv.reshape(S, 1, LANE)
                _acc64v(acc, r0, nr, 2, _rsum3(ohv.astype(jnp.int32), nr))
            else:
                ohv = oh3
                _acc64v(acc, r0, nr, 2, cp)
            if s.want_sum and s.is_float:
                hi_f = _inv_norm_plane(vhi ^ I32MIN).reshape(S, 1, LANE)
                lo_f = _inv_norm_plane(vlo).reshape(S, 1, LANE)
                z = jnp.float32(0)
                _accf32v(acc, r0, nr, 4, _rsumf3(jnp.where(ohv, hi_f, z),
                                                 nr))
                _accf32v(acc, r0, nr, 6, _rsumf3(jnp.where(ohv, lo_f, z),
                                                 nr))
            elif s.want_sum:
                for k, limb in enumerate(_limbs16(vlo, vhi)):
                    l3 = limb.reshape(S, 1, LANE)
                    pk = _rsum3(jnp.where(ohv, l3, jnp.int32(0)), nr)
                    _acc64v(acc, r0, nr, 4 + 2 * k, pk)
            if s.want_minmax:
                _update_minmax(acc, r0, nr, ohv, vhi.reshape(S, 1, LANE),
                               (vlo ^ I32MIN).reshape(S, 1, LANE))

    def _chunked_pass(sel_lo, sel_hi, out_matched):
        """Compare the block against table rows [sel_lo, sel_hi) chunk by
        chunk; accumulate; optionally OR membership into matched_ref."""
        for c0 in range(0, Gcap, GC):
            nr = min(GC, Gcap - c0)
            gcol = lax.broadcasted_iota(jnp.int32, (nr, 1), 0) + \
                jnp.int32(c0)
            gsel3 = ((gcol >= sel_lo) & (gcol < sel_hi)).reshape(1, nr, 1)
            tlo3 = tbl_ref[c0:c0 + nr, 0:1].reshape(1, nr, 1)
            thi3 = tbl_ref[c0:c0 + nr, 1:2].reshape(1, nr, 1)
            oh3 = (khi3 == thi3) & (klo3 == tlo3) & km3 & gsel3
            if out_matched:
                # NOT jnp.any: a middle-axis bool any-reduce lowers to an
                # f64 max multi_reduction Mosaic rejects; an i32 sum is fine
                m = jnp.sum(oh3.astype(jnp.int32), axis=1, dtype=jnp.int32)
                if c0 == 0:
                    matched_ref[...] = m
                else:
                    matched_ref[...] = matched_ref[...] | m
            _accumulate3(oh3, c0, nr)

    # ---- pass over already-discovered groups ------------------------------
    cnt0 = meta_ref[0]
    _chunked_pass(jnp.int32(0), cnt0, out_matched=True)

    # ---- discovery: insert unmatched keys, smallest first -----------------
    # The while body ONLY discovers (scalar reduces + a masked table write);
    # the newly inserted groups' rows accumulate afterwards in one predicated
    # rerun of the chunked pass. Keeping accumulator ops out of the while
    # body avoids a Mosaic ApplyVectorLayout crash (scf_while_rule /
    # vector_extract_strided_slice) and runs the fast path on every block
    # that discovers nothing.
    def um_count():
        um = km & (matched_ref[...] == 0)
        return _scalar_sum(um.astype(jnp.int32))

    def cond(carry):
        cnt, pending = carry
        return (pending > 0) & (cnt < jnp.int32(Gcap))

    def body(carry):
        cnt, _ = carry
        um = km & (matched_ref[...] == 0)
        nh = _scalar_min(jnp.where(um, khi, I32MAX))
        tie = um & (khi == nh)
        nl = _scalar_min(jnp.where(tie, klo ^ I32MIN, I32MAX)) ^ I32MIN
        # fresh [Gcap,LANE] iotas: slicing the [GN,LANE] ones here crashes
        # Mosaic's ApplyVectorLayout (extract_strided_slice in scf.while)
        giT = lax.broadcasted_iota(jnp.int32, (Gcap, LANE), 0)
        laneT = lax.broadcasted_iota(jnp.int32, (Gcap, LANE), 1)
        sel2 = giT == cnt                                    # [Gcap,LANE]
        tbl = tbl_ref[...]
        tbl = jnp.where(sel2 & (laneT == 0), nl, tbl)
        tbl = jnp.where(sel2 & (laneT == 1), nh, tbl)
        tbl_ref[...] = tbl
        m_new = km & (khi == nh) & (klo == nl)               # [S,L]
        matched_ref[...] = matched_ref[...] | m_new.astype(jnp.int32)
        return cnt + 1, um_count()

    cnt, pending = lax.while_loop(cond, body, (cnt0, um_count()))
    meta_ref[0] = cnt
    meta_ref[1] = meta_ref[1] | (pending > 0).astype(jnp.int32)

    @pl.when(cnt > cnt0)
    def _accumulate_new_groups():
        _chunked_pass(cnt0, cnt, out_matched=False)

    # ---- null-key group: reserved accumulator row Gcap --------------------
    if has_null_path:
        mnull3 = (kv == 2).reshape(S, 1, LANE)
        _accumulate3(mnull3, Gcap, 1)


def aggregate_pallas(kv, klo, khi, value_limbs, specs: Sequence[ValueSpec],
                     max_groups: int = G, has_null_path: bool = True,
                     interpret: bool = False):
    """Run the one-pass aggregate.

    kv: int32[N] row code (0 invalid, 1 valid key, 2 null key, valid row);
    klo/khi: int32[N] key limbs; value_limbs: per value column a tuple
    (vlo, vhi[, vvalid]) of int32[N]. N must be a multiple of the block size
    (_choose_rows(N) * LANE -- callers pad with kv=0).

    Returns (tbl[2, Gcap] i32, cnt, overflow, per-value acc[Gcap+8, 16]) --
    use the decode helpers below. Group slots are in discovery order
    (per-block smallest-ENCODED-key-first); the null-key group occupies acc
    row Gcap.
    """
    n = kv.shape[0]
    S = _choose_rows(n)
    B = S * LANE
    assert n % B == 0, (n, B)
    nb = n // B
    specs = tuple(specs)
    nv = len(specs)
    Gcap = capacity_for(max_groups)
    GN = Gcap + 8

    def reshape(x):
        return x.reshape(nb, S, LANE)

    ins = [reshape(kv), reshape(klo), reshape(khi)]
    for limbs in value_limbs:
        for a in limbs:
            ins.append(reshape(a))
    n_stream = len(ins)

    out_shape = [jax.ShapeDtypeStruct((Gcap, LANE), jnp.int32),  # tbl
                 jax.ShapeDtypeStruct((8,), jnp.int32)]          # meta
    for _ in range(nv):
        out_shape.append(jax.ShapeDtypeStruct((GN, LANE), jnp.int32))

    # Explicit whole-array out specs: a default BlockSpec's index map emits
    # literal 0s, which trace as i64 under x64 and fail Mosaic lowering;
    # i * 0 inherits the grid index's i32.
    def const_spec(shape, space):
        return pl.BlockSpec(shape, lambda i, _nd=len(shape): (i * 0,) * _nd,
                            memory_space=space)

    out_specs = [const_spec((Gcap, LANE), pltpu.VMEM),
                 const_spec((8,), pltpu.SMEM)]
    out_specs += [const_spec((GN, LANE), pltpu.VMEM)] * nv

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, S, LANE), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] * n_stream,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((S, LANE), jnp.int32)],
    )

    def kernel(*refs):
        ins_r = [r.at[0] for r in refs[:n_stream]]
        rest = refs[n_stream:]
        _kernel(*(tuple(ins_r) + tuple(rest)),
                num_values=nv, specs=specs, S=S, Gcap=Gcap,
                has_null_path=has_null_path, nb=nb)

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*ins)
    tblv, meta = outs[0], outs[1]
    tbl = jnp.stack([tblv[:, 0], tblv[:, 1]])               # [2, Gcap]
    per_value = [outs[2 + v][:, :_NLANES] for v in range(nv)]
    return tbl, meta[0], meta[1], per_value


# --------------------------------------------------------------------------
# XLA-side reconstruction (tiny arrays; int64 is fine here)
# --------------------------------------------------------------------------

def _u64(lo, carry):
    """(lo i32 as u32, carry i32) -> int64 = lo + carry * 2^32 (mod 2^64)."""
    return lo.astype(jnp.uint32).astype(jnp.int64) + \
        (carry.astype(jnp.int64) << 32)


def keys_from_table(tbl):
    return (tbl[1].astype(jnp.int64) << 32) | \
        tbl[0].astype(jnp.uint32).astype(jnp.int64)


def counts_from(acc):
    """acc[GN, 16] -> (count_all int64[GN], count_valid int64[GN])."""
    return _u64(acc[:, 0], acc[:, 1]), _u64(acc[:, 2], acc[:, 3])


def sum_from(acc):
    """acc[GN, 16] 16-bit-limb (lo, carry) pairs -> int64[GN] with
    wraparound mod 2^64 (Arrow int64 sum semantics)."""
    total = jnp.zeros(acc.shape[0], dtype=jnp.int64)
    for k in range(4):
        t = _u64(acc[:, 4 + 2 * k], acc[:, 5 + 2 * k])
        total = total + (t << (16 * k))
    return total


def sum_from_float(acc):
    """acc[GN, 16] float lanes -> float64[GN]: (hi sum + hi comp) +
    (lo sum + lo comp), each an f32 bit pattern."""
    def f(lane):
        return acc[:, lane].view(jnp.float32).astype(jnp.float64)
    return (f(4) + f(5)) + (f(6) + f(7))


def minmax_from(acc):
    """acc[GN, 16] -> (min int64[GN], max int64[GN]); empty slots decode
    to int64::max / int64::min (the segment_reduce identities)."""
    def comb(hi, lo_b):
        lo = (lo_b ^ I32MIN).astype(jnp.uint32).astype(jnp.int64)
        return (hi.astype(jnp.int64) << 32) | lo
    return comb(acc[:, 12], acc[:, 13]), comb(acc[:, 14], acc[:, 15])


def minmax_bits_from(acc):
    """acc[GN, 16] -> min/max ENCODED (hi i32, lo i32 unbiased) limb pairs
    for float decode (caller denormalizes)."""
    return ((acc[:, 12], acc[:, 13] ^ I32MIN),
            (acc[:, 14], acc[:, 15] ^ I32MIN))
