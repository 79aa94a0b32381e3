"""Pallas one-pass hash aggregate for low-cardinality GROUP BY.

Replaces the XLA path (ops/hash_aggregate.py) on TPU for integer keys and
values with <=128 groups: group discovery AND sum/count/min/max accumulate in
a single pass over HBM. Reference behavior: Acero 'aggregate' oracle
(SURVEY.md SS2c, BASELINE configs[1]); the reference Gandiva itself has no
aggregate -- this operator's contract comes from pyarrow.acero.

V2 design (V1 -- a per-group fori over SMEM scalar accumulators -- measured
86.8 Mrows/s, ~0.2% of HBM; the fori serialized G whole-block reductions per
block and every reduction paid a sublane->lane relayout):

- Grid over row blocks of S*128 rows; TPU grid steps run sequentially, so
  the group table and accumulators live in VMEM *outputs* with constant
  index maps (one window for the whole run), initialized at step 0 with two
  vector stores (no scalar-unrolled init).
- The whole block compares against the whole table at once: a 3-D broadcast
  oh[S, G, L] = (khi[S,1,L] == tbl_hi[1,G,1]) & (klo == tbl_lo)
                & key_valid & (slot < cnt)
  -- no loop over groups, no relayouts (keys stay in their natural (sublane,
  lane) tiles; the table broadcasts from a [G,1] lane-column). Every
  aggregate is then a masked reduction over axes (0, 2) producing a [G]
  sublane vector, accumulated into a [G+8, 16-lane] VMEM accumulator with
  vector ops. ~26 VPU passes over [S,G,L] per block ~= 0.4-0.9 cycles/row.
- The slot<cnt mask keeps rows from matching undiscovered (zero-initialized)
  table slots; capacity G is STATIC per call (max_groups rounded up to 8,
  capped at 128), so 64-group queries do half the VPU work of 128.
- Unmatched keys insert via a masked-vector table write
  (tbl = where(slot_iota == cnt, new_key, tbl)) -- no dynamic stores --
  smallest key first, so discovery order is deterministic. Insertions are
  bounded by G over the WHOLE run; steady-state blocks never enter the loop.
  More than G distinct keys sets the overflow flag (Status-style error
  surface, SURVEY.md SS5.3 -- caller falls back).
- Exactness without 64-bit arithmetic (Mosaic has no i64): values split
  into four 16-bit limbs; per-block masked limb sums are <= S*128*(2^16-1)
  < 2^31 (S <= 64), accumulated into (lo, carry) i32 pairs with
  unsigned-wrap carry detection -- exact int64 sums (mod 2^64) for any row
  count. Min/max compare as (signed hi, bias-flipped lo) pairs,
  lexicographically, all as [G]-vector updates.
- Null-key rows (SQL: nulls form their own group) accumulate into SMEM
  scalars, merged into reserved accumulator row G at the last block.

Empty-group identities match ops/hash_aggregate.segment_reduce: sum/count 0,
min int64::max, max int64::min (the lane init values decode to exactly
these).

Accumulator lane layout per value column (acc[G+8, 16] i32):
  0/1   count_all  (lo, carry)
  2/3   count_valid (lo, carry)
  4..11 sum 16-bit limb k -> lanes (4+2k, 5+2k) as (lo, carry)
  12/13 min (hi signed, lo bias-flipped)
  14/15 max (hi signed, lo bias-flipped)
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
G = 128                      # MAX group-table capacity
# numpy scalars, not jnp: jnp constants at module scope become concrete
# device arrays that pallas_call would treat as captured consts
I32MAX = np.int32(2**31 - 1)
I32MIN = np.int32(-2**31)

# null-group SMEM scalar slots (per value column), mirroring the acc lanes
_NLANES = 16


class ValueSpec(NamedTuple):
    """Static per-value-column config."""
    want_sum: bool = True
    want_minmax: bool = True
    has_valid: bool = False


def capacity_for(max_groups: int) -> int:
    """Static table capacity: max_groups rounded up to a sublane multiple."""
    return min(G, max(8, -(-max_groups // 8) * 8))


def _choose_rows(n):
    """Sublanes per block: S*128-row blocks; S=64 keeps the per-block masked
    limb sums < 2^31 (exactness) and the [S,G,L] intermediates ~<=2 MB."""
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


def _scalar_max(x):
    r = jnp.max(x, axis=1)
    return jnp.max(r.reshape(1, -1), axis=1)[0]


def _limbs16(vlo, vhi):
    """[S,L] i32 limb pair -> four [S,L] 16-bit limb planes (i32)."""
    M16 = jnp.int32(0xFFFF)
    s16 = jnp.int32(16)
    return (vlo & M16, lax.shift_right_logical(vlo, s16),
            vhi & M16, lax.shift_right_logical(vhi, s16))


def _kernel(kv_ref, klo_ref, khi_ref, *refs,
            num_values: int, specs: Tuple[ValueSpec, ...], S: int,
            Gcap: int, has_null_path: bool, nb: int):
    nv = num_values
    GN = Gcap + 8
    # remaining input refs: per value (vlo, vhi[, vvalid])
    vrefs = []
    p = 0
    for s in specs:
        k = 3 if s.has_valid else 2
        vrefs.append(refs[p:p + k])
        p += k
    tbl_ref = refs[p]                                # VMEM [Gcap, LANE]
    meta_ref = refs[p + 1]                           # SMEM [8]
    null_ref = refs[p + 2]                           # SMEM [nv, 16]
    acc_refs = refs[p + 3:p + 3 + nv]                # VMEM [GN, LANE] each
    matched_ref = refs[p + 3 + nv]                   # VMEM [S, LANE] scratch

    lane2 = lax.broadcasted_iota(jnp.int32, (GN, LANE), 1)
    gi2 = lax.broadcasted_iota(jnp.int32, (GN, LANE), 0)
    gcol = lax.broadcasted_iota(jnp.int32, (Gcap, 1), 0)     # [Gcap,1]

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
        for v in range(nv):
            for j in (12, 13):
                null_ref[v, j] = I32MAX
            for j in (14, 15):
                null_ref[v, j] = I32MIN
            for j in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11):
                null_ref[v, j] = jnp.int32(0)

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
    def _acc64v(acc, lane, pcol):
        """pcol: [Gcap, 1] i32 >= 0 partial; lanes (lane, lane+1)."""
        old = acc[0:Gcap, lane:lane + 1]
        new = old + pcol
        carry = (new.astype(jnp.uint32) < pcol.astype(jnp.uint32))
        acc[0:Gcap, lane:lane + 1] = new
        acc[0:Gcap, lane + 1:lane + 2] = \
            acc[0:Gcap, lane + 1:lane + 2] + carry.astype(jnp.int32)

    def _reduce_sum3(x):
        """[S,G,L] i32 -> [Gcap,1]: leading axis first, then lanes."""
        t = jnp.sum(x, axis=0, dtype=jnp.int32)             # [G,L]
        return jnp.sum(t, axis=1, dtype=jnp.int32).reshape(Gcap, 1)

    def _reduce_min3(x):
        t = jnp.min(x, axis=0)
        return jnp.min(t, axis=1).reshape(Gcap, 1)

    def _reduce_max3(x):
        t = jnp.max(x, axis=0)
        return jnp.max(t, axis=1).reshape(Gcap, 1)

    def _update_minmax(acc, oh3, vhi3, vlo_b3):
        """Lexicographic (hi, biased lo) min into lanes 12/13, max 14/15."""
        bh = _reduce_min3(jnp.where(oh3, vhi3, I32MAX))      # [Gcap,1]
        bh3 = bh.reshape(1, Gcap, 1)
        bl = _reduce_min3(jnp.where(oh3 & (vhi3 == bh3), vlo_b3, I32MAX))
        ch = acc[0:Gcap, 12:13]
        cl = acc[0:Gcap, 13:14]
        better = (bh < ch) | ((bh == ch) & (bl < cl))
        acc[0:Gcap, 12:13] = jnp.where(better, bh, ch)
        acc[0:Gcap, 13:14] = jnp.where(better, bl, cl)
        xh = _reduce_max3(jnp.where(oh3, vhi3, I32MIN))
        xh3 = xh.reshape(1, Gcap, 1)
        xl = _reduce_max3(jnp.where(oh3 & (vhi3 == xh3), vlo_b3, I32MIN))
        ch = acc[0:Gcap, 14:15]
        cl = acc[0:Gcap, 15:16]
        better = (xh > ch) | ((xh == ch) & (xl > cl))
        acc[0:Gcap, 14:15] = jnp.where(better, xh, ch)
        acc[0:Gcap, 15:16] = jnp.where(better, xl, cl)

    def _accumulate3(oh3):
        """Main vector accumulation: oh3 [S,Gcap,L] bool membership."""
        for v, s in enumerate(specs):
            acc = acc_refs[v]
            vlo, vhi, vv = vals[v]
            cp = _reduce_sum3(oh3.astype(jnp.int32))
            _acc64v(acc, 0, cp)
            if vv is not None:
                ohv = oh3 & vv.reshape(S, 1, LANE)
                _acc64v(acc, 2, _reduce_sum3(ohv.astype(jnp.int32)))
            else:
                ohv = oh3
                _acc64v(acc, 2, cp)
            if s.want_sum:
                for k, limb in enumerate(_limbs16(vlo, vhi)):
                    l3 = limb.reshape(S, 1, LANE)
                    pk = _reduce_sum3(jnp.where(ohv, l3, jnp.int32(0)))
                    _acc64v(acc, 4 + 2 * k, pk)
            if s.want_minmax:
                _update_minmax(acc, ohv, vhi.reshape(S, 1, LANE),
                               (vlo ^ I32MIN).reshape(S, 1, LANE))

    # ---- pass over already-discovered groups ------------------------------
    cnt0 = meta_ref[0]
    gsel3 = (gcol < cnt0).reshape(1, Gcap, 1)
    tlo3 = tbl_ref[:, 0:1].reshape(1, Gcap, 1)
    thi3 = tbl_ref[:, 1:2].reshape(1, Gcap, 1)
    oh3 = (khi3 == thi3) & (klo3 == tlo3) & km3 & gsel3      # [S,Gcap,L]
    # NOT jnp.any: a middle-axis bool any-reduce lowers to an f64 max
    # multi_reduction Mosaic rejects; an i32 sum lowers fine. matched lives
    # in a VMEM scratch (i32 0/1), not a while carry: vector/mask carries
    # through scf.while crash Mosaic's ApplyVectorLayout.
    matched_ref[...] = jnp.sum(oh3.astype(jnp.int32), axis=1,
                               dtype=jnp.int32)              # [S,L] 0/1
    _accumulate3(oh3)

    # ---- discovery: insert unmatched keys, smallest first -----------------
    # The while body ONLY discovers (scalar reduces + a masked table write);
    # the newly inserted groups' rows accumulate afterwards in one predicated
    # rerun of the vector pass. Keeping [Gcap,1] accumulator ops out of the
    # while body avoids a Mosaic ApplyVectorLayout crash (scf_while_rule /
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
        nsel3 = ((gcol >= cnt0) & (gcol < cnt)).reshape(1, Gcap, 1)
        ntlo3 = tbl_ref[:, 0:1].reshape(1, Gcap, 1)
        nthi3 = tbl_ref[:, 1:2].reshape(1, Gcap, 1)
        ohn = (khi3 == nthi3) & (klo3 == ntlo3) & km3 & nsel3
        _accumulate3(ohn)

    # ---- null-key group: SMEM scalars, merged at the last block -----------
    if has_null_path:
        mnull = kv == 2                                      # [S,L]
        mi = mnull.astype(jnp.int32)
        for v, s in enumerate(specs):
            vlo, vhi, vv = vals[v]

            def _s64(j, ps):
                old = null_ref[v, j]
                new = old + ps
                carry = new.astype(jnp.uint32) < ps.astype(jnp.uint32)
                null_ref[v, j] = new
                null_ref[v, j + 1] = null_ref[v, j + 1] + \
                    carry.astype(jnp.int32)

            cp = _scalar_sum(mi)
            _s64(0, cp)
            if vv is not None:
                mv = mnull & vv
                _s64(2, _scalar_sum(mv.astype(jnp.int32)))
            else:
                mv = mnull
                _s64(2, cp)
            if s.want_sum:
                for k, limb in enumerate(_limbs16(vlo, vhi)):
                    _s64(4 + 2 * k,
                         _scalar_sum(jnp.where(mv, limb, jnp.int32(0))))
            if s.want_minmax:
                vlo_b = vlo ^ I32MIN
                bh = _scalar_min(jnp.where(mv, vhi, I32MAX))
                bl = _scalar_min(jnp.where(mv & (vhi == bh), vlo_b, I32MAX))
                ch, cl = null_ref[v, 12], null_ref[v, 13]
                better = (bh < ch) | ((bh == ch) & (bl < cl))
                null_ref[v, 12] = jnp.where(better, bh, ch)
                null_ref[v, 13] = jnp.where(better, bl, cl)
                xh = _scalar_max(jnp.where(mv, vhi, I32MIN))
                xl = _scalar_max(jnp.where(mv & (vhi == xh), vlo_b, I32MIN))
                ch, cl = null_ref[v, 14], null_ref[v, 15]
                better = (xh > ch) | ((xh == ch) & (xl > cl))
                null_ref[v, 14] = jnp.where(better, xh, ch)
                null_ref[v, 15] = jnp.where(better, xl, cl)

        @pl.when(pl.program_id(0) == jnp.int32(nb - 1))
        def _merge_null():
            for v in range(nv):
                acc = acc_refs[v]
                cur = acc[...]
                for j in range(_NLANES):
                    cur = jnp.where((gi2 == jnp.int32(Gcap))
                                    & (lane2 == j), null_ref[v, j], cur)
                acc[...] = cur


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
    (per-block smallest-key-first); the null-key group occupies acc row Gcap.
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
                 jax.ShapeDtypeStruct((8,), jnp.int32),          # meta
                 jax.ShapeDtypeStruct((nv, _NLANES), jnp.int32)]  # null acc
    for _ in range(nv):
        out_shape.append(jax.ShapeDtypeStruct((GN, LANE), jnp.int32))

    # Explicit whole-array out specs: a default BlockSpec's index map emits
    # literal 0s, which trace as i64 under x64 and fail Mosaic lowering;
    # i * 0 inherits the grid index's i32.
    def const_spec(shape, space):
        return pl.BlockSpec(shape, lambda i, _nd=len(shape): (i * 0,) * _nd,
                            memory_space=space)

    out_specs = [const_spec((Gcap, LANE), pltpu.VMEM),
                 const_spec((8,), pltpu.SMEM),
                 const_spec((nv, _NLANES), pltpu.SMEM)]
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
    per_value = [outs[3 + v][:, :_NLANES] for v in range(nv)]
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


def minmax_from(acc):
    """acc[GN, 16] -> (min int64[GN], max int64[GN]); empty slots decode
    to int64::max / int64::min (the segment_reduce identities)."""
    def comb(hi, lo_b):
        lo = (lo_b ^ I32MIN).astype(jnp.uint32).astype(jnp.int64)
        return (hi.astype(jnp.int64) << 32) | lo
    return comb(acc[:, 12], acc[:, 13]), comb(acc[:, 14], acc[:, 15])
