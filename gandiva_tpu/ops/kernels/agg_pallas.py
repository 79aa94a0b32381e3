"""Pallas one-pass hash aggregate for low-cardinality GROUP BY.

Replaces the XLA path (ops/hash_aggregate.py) on TPU for integer keys and
values with ≤128 groups: group discovery AND sum/count/min/max accumulate in
a single pass over HBM, where the XLA path needs a distinct-key scan plus
one [N, G] masked reduction per aggregate (measured 97 Mrows/s at 16M rows;
the [N, G] broadcast-compare reduce alone costs 60-260 ms).

Design (reference behavior: Acero 'aggregate' oracle, SURVEY.md §2c):

- Grid over row blocks; TPU grid steps run sequentially, so the group table
  and every accumulator live in SMEM *outputs* that persist across steps
  (constant index map ⇒ one window for the whole run). Output windows start
  uninitialized; step 0 writes zeros/sentinels with unrolled scalar stores
  (SMEM accepts only scalar stores).
- Keys/values stream through VMEM as 32-bit lanes (64-bit columns arrive as
  (lo, hi) i32 limb pairs — utils/bits.py lane discipline).
- Per block, a fori over the discovered groups g computes the membership
  vector m = (khi==tbl_hi[g]) & (klo==tbl_lo[g]) and reduces counts, limb
  sums, and min/max under it; SMEM scalars accumulate across blocks.
- Rows matching no group insert new table entries in a while_loop (the
  lexicographically smallest unmatched key first, so discovery order is
  deterministic); each insertion immediately runs the same group update.
  Insertions are bounded by G over the WHOLE run, so steady-state blocks
  never enter the loop. More than G distinct keys sets the overflow flag
  (Status-style error surface, SURVEY.md §5.3 — caller falls back).
- Exactness without 64-bit arithmetic (Mosaic has no i64): values split
  into four 16-bit limbs; per-block limb sums reduce lanes first (row sums
  ≤ 2^23), split into (lo16, hi16) parts (≤ 2^25 / ≤ 2^16 for R ≤ 512),
  and accumulate into (lo, carry, hi16) i32 triples with unsigned-wrap
  carry detection — exact int64 sums (mod 2^64) for up to 2^31 rows.
  Min/max compare as (signed hi, bias-flipped lo) pairs, lexicographically.
- Null-key rows (SQL: nulls form their own group) accumulate at reserved
  slot G via a per-block mask — no table entry needed.

Empty-group identities match ops/hash_aggregate.segment_reduce: sum/count 0,
min int64::max, max int64::min (the sentinels decode to exactly these).
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
G = 128                      # group-table capacity
GP = G + 8                   # +1 null-group slot, padded
# numpy scalars, not jnp: jnp constants at module scope become concrete
# device arrays that pallas_call would treat as captured consts
I32MAX = np.int32(2**31 - 1)
I32MIN = np.int32(-2**31)


class ValueSpec(NamedTuple):
    """Static per-value-column config."""
    want_sum: bool = True
    want_minmax: bool = True
    has_valid: bool = False


def _min_scalar(w):
    """Scalar min of a 2-D i32 tile without a scalar-output reduce
    primitive (see _sum_scalar for why)."""
    r = jnp.min(w, axis=1)
    return jnp.min(r.reshape(1, -1), axis=1)[0]


def _max_scalar(w):
    r = jnp.max(w, axis=1)
    return jnp.max(r.reshape(1, -1), axis=1)[0]


def _sum_scalar(x):
    """Exact whole-tile sum for i32 x whose per-row totals stay < 2^23:
    reduce lanes first, then split the row sums into 16-bit parts so the
    scalar adds stay in i32 range. Returns (lo, hi16): total = lo+(hi<<16).
    """
    # dtype pinned everywhere: under x64 jnp.sum promotes i32 → i64, which
    # Mosaic cannot lower. Scalar-OUTPUT reduce primitives also hit a Mosaic
    # proxy that re-reduces without the dtype pin (and promotes), so every
    # reduction keeps one axis at the primitive level and extracts [0].
    rs = jnp.sum(x, axis=1, dtype=jnp.int32)                 # [R] ≤ 2^23
    lo = jnp.sum((rs & jnp.int32(0xFFFF)).reshape(1, -1), axis=1,
                 dtype=jnp.int32)[0]
    hi = jnp.sum(lax.shift_right_logical(rs, jnp.int32(16)).reshape(1, -1),
                 axis=1, dtype=jnp.int32)[0]
    return lo, hi


def _kernel(kv_ref, klo_ref, khi_ref, *refs,
            num_values: int, specs: Tuple[ValueSpec, ...], rows: int):
    nv = num_values
    # remaining input refs: per value (vlo, vhi[, vvalid])
    vrefs = []
    p = 0
    for s in specs:
        k = 3 if s.has_valid else 2
        vrefs.append(refs[p:p + k])
        p += k
    tbl_ref = refs[p]                                # SMEM [2, G]
    meta_ref = refs[p + 1]                           # SMEM [8]
    orefs = refs[p + 2:p + 2 + 3 * nv]
    matched_ref = refs[p + 2 + 3 * nv]               # VMEM [rows, LANE] i32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        meta_ref[0] = jnp.int32(0)
        meta_ref[1] = jnp.int32(0)
        z = jnp.int32(0)
        for v in range(nv):
            cnts, sums, minmax = orefs[3 * v], orefs[3 * v + 1], \
                orefs[3 * v + 2]
            for g in range(G + 1):                   # slots 0..G inclusive
                cnts[0, g] = z
                cnts[1, g] = z
                for k in range(4):
                    sums[k, 0, g] = z
                    sums[k, 1, g] = z
                    sums[k, 2, g] = z
                minmax[0, g] = I32MAX
                minmax[1, g] = I32MAX
                minmax[2, g] = I32MIN
                minmax[3, g] = I32MIN

    kv = kv_ref[...]                                 # [R,128] 0/1/2 code
    klo = klo_ref[...]
    khi = khi_ref[...]
    kmask = (kv == 1).astype(jnp.int32)
    vals = []
    for v, s in enumerate(specs):
        vlo = vrefs[v][0][...]
        vhi = vrefs[v][1][...]
        vv = vrefs[v][2][...] if s.has_valid else None
        vals.append((vlo, vhi, vv))
    matched_ref[...] = jnp.zeros((rows, LANE), jnp.int32)

    def _acc_add(sums, k, g, s_lo, s_hi16):
        """(lo ≤ 2^25, hi16 ≤ 2^16) block sum → (lo, carry, hi16) triple."""
        old = sums[k, 0, g]
        new = old + s_lo                             # i32 wrap
        carry = new.astype(jnp.uint32) < s_lo.astype(jnp.uint32)
        sums[k, 0, g] = new
        sums[k, 1, g] = sums[k, 1, g] + carry.astype(jnp.int32)
        sums[k, 2, g] = sums[k, 2, g] + s_hi16

    def _accumulate(g, m):
        """m: 0/1 membership [R,128]; g: scalar slot index < GP."""
        for v, s in enumerate(specs):
            cnts, sums, minmax = orefs[3 * v], orefs[3 * v + 1], \
                orefs[3 * v + 2]
            vlo, vhi, vv = vals[v]
            ck_lo, ck_hi = _sum_scalar(m)            # row counts ≤ 128 ⇒
            ck = ck_lo + (ck_hi << 16)               # hi always 0; ck ≤ 2^16
            cnts[0, g] = cnts[0, g] + ck
            mv = m * vv if vv is not None else m
            if vv is not None:
                cv_lo, cv_hi = _sum_scalar(mv)
                cnts[1, g] = cnts[1, g] + cv_lo + (cv_hi << 16)
            else:
                cnts[1, g] = cnts[0, g]              # already updated
            if s.want_sum:
                vm_lo = mv * vlo
                vm_hi = mv * vhi
                for k, src, sh in ((0, vm_lo, 0), (1, vm_lo, 16),
                                   (2, vm_hi, 0), (3, vm_hi, 16)):
                    limb = lax.shift_right_logical(src, jnp.int32(sh)) \
                        & jnp.int32(0xFFFF)
                    s_lo, s_h = _sum_scalar(limb)
                    _acc_add(sums, k, g, s_lo, s_h)
            if s.want_minmax:
                mb = mv > 0
                lo_b = vlo ^ I32MIN                  # unsigned-order bias
                bh = _min_scalar(jnp.where(mb, vhi, I32MAX))
                tie = mb & (vhi == bh)
                bl = _min_scalar(jnp.where(tie, lo_b, I32MAX))
                better = (bh < minmax[0, g]) | (
                    (bh == minmax[0, g]) & (bl < minmax[1, g]))
                minmax[0, g] = jnp.where(better, bh, minmax[0, g])
                minmax[1, g] = jnp.where(better, bl, minmax[1, g])
                xh = _max_scalar(jnp.where(mb, vhi, I32MIN))
                xtie = mb & (vhi == xh)
                xl = _max_scalar(jnp.where(xtie, lo_b, I32MIN))
                xbetter = (xh > minmax[2, g]) | (
                    (xh == minmax[2, g]) & (xl > minmax[3, g]))
                minmax[2, g] = jnp.where(xbetter, xh, minmax[2, g])
                minmax[3, g] = jnp.where(xbetter, xl, minmax[3, g])

    def group_update(g, kh, kl):
        m = kmask * ((khi == kh) & (klo == kl)).astype(jnp.int32)
        matched_ref[...] = matched_ref[...] | m
        _accumulate(g, m)

    # --- pass over already-discovered groups ------------------------------
    cnt0 = meta_ref[0]

    def g_body(g, carry):
        group_update(g, tbl_ref[1, g], tbl_ref[0, g])
        return carry

    lax.fori_loop(jnp.int32(0), cnt0, g_body, jnp.int32(0))

    # --- discovery: insert unmatched keys, smallest first -----------------
    def um_count():
        um = kmask * (jnp.int32(1) - matched_ref[...])
        lo, hi = _sum_scalar(um)
        return lo + (hi << 16)

    def cond(carry):
        cnt, pending = carry
        return (pending > 0) & (cnt < jnp.int32(G))

    def body(carry):
        cnt, _ = carry
        um = (kmask * (jnp.int32(1) - matched_ref[...])) > 0
        nh = _min_scalar(jnp.where(um, khi, I32MAX))
        tie = um & (khi == nh)
        nl_b = _min_scalar(jnp.where(tie, klo ^ I32MIN, I32MAX))
        nl = nl_b ^ I32MIN
        tbl_ref[0, cnt] = nl
        tbl_ref[1, cnt] = nh
        group_update(cnt, nh, nl)
        return cnt + 1, um_count()

    cnt, pending = lax.while_loop(cond, body, (cnt0, um_count()))
    meta_ref[0] = cnt
    meta_ref[1] = meta_ref[1] | (pending > 0).astype(jnp.int32)

    # --- null-key group at reserved slot G --------------------------------
    mnull = (kv == 2).astype(jnp.int32)
    _accumulate(jnp.int32(G), mnull)


def _choose_rows(n):
    """Rows-per-block: large blocks amortize the per-group scalar loop, but
    the limb-sum exactness argument needs R ≤ 512, and tiny inputs want a
    single block."""
    for r in (512, 256, 128, 64, 32, 16, 8):
        if n >= r * LANE:
            return r
    return 8


def aggregate_pallas(kv, klo, khi, value_limbs, specs: Sequence[ValueSpec],
                     interpret: bool = False):
    """Run the one-pass aggregate.

    kv: int32[N] row code (0 invalid, 1 valid key, 2 null key, valid row);
    klo/khi: int32[N] key limbs; value_limbs: per value column a tuple
    (vlo, vhi[, vvalid]) of int32[N]. N must be a multiple of 1024 (callers
    pad with kv=0) and < 2^31.

    Returns (tbl[2,G] i32, cnt, overflow, per-value (cnts[2,GP],
    sums[4,3,GP], minmax[4,GP])) — use the reconstruction helpers below.
    Group slots are in discovery order (per-block lexicographic-min-first);
    the null-key group accumulates at slot index G of the GP axis.
    """
    n = kv.shape[0]
    rows = _choose_rows(n)
    B = rows * LANE
    assert n % B == 0, (n, B)
    nb = n // B
    specs = tuple(specs)
    nv = len(specs)

    def reshape(x):
        return x.reshape(nb, rows, LANE)

    ins = [reshape(kv), reshape(klo), reshape(khi)]
    for limbs in value_limbs:
        for a in limbs:
            ins.append(reshape(a))
    n_stream = len(ins)

    out_shape = [jax.ShapeDtypeStruct((2, G), jnp.int32),      # tbl
                 jax.ShapeDtypeStruct((8,), jnp.int32)]        # meta
    for _ in range(nv):
        out_shape += [jax.ShapeDtypeStruct((2, GP), jnp.int32),
                      jax.ShapeDtypeStruct((4, 3, GP), jnp.int32),
                      jax.ShapeDtypeStruct((4, GP), jnp.int32)]

    # Explicit whole-array out specs: a default BlockSpec's index map emits
    # literal 0s, which trace as i64 under x64 and fail Mosaic lowering
    # ("func.return (i64, i64)"); i * 0 inherits the grid index's i32.
    def smem_spec(shape):
        return pl.BlockSpec(shape, lambda i, _nd=len(shape): (i * 0,) * _nd,
                            memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, rows, LANE), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)] * n_stream,
        out_specs=[smem_spec(s.shape) for s in out_shape],
        scratch_shapes=[pltpu.VMEM((rows, LANE), jnp.int32)],
    )

    def kernel(*refs):
        ins_r = [r.at[0] for r in refs[:n_stream]]
        rest = refs[n_stream:]
        _kernel(*(tuple(ins_r) + tuple(rest)),
                num_values=nv, specs=specs, rows=rows)

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*ins)
    tbl, meta = outs[0], outs[1]
    per_value = [tuple(outs[2 + 3 * v:2 + 3 * v + 3]) for v in range(nv)]
    return tbl, meta[0], meta[1], per_value


# --------------------------------------------------------------------------
# XLA-side reconstruction (tiny arrays; int64 is fine here)
# --------------------------------------------------------------------------

def keys_from_table(tbl):
    return (tbl[1].astype(jnp.int64) << 32) | \
        tbl[0].astype(jnp.uint32).astype(jnp.int64)


def counts_from(cnts):
    """cnts[2, GP] → (count_all int64[GP], count_valid int64[GP])."""
    return cnts[0].astype(jnp.int64), cnts[1].astype(jnp.int64)


def sum_from(sums):
    """sums[4, 3, GP] ((lo, carry, hi16) per 16-bit limb) → int64[GP] with
    wraparound mod 2^64 (Arrow int64 sum semantics)."""
    total = jnp.zeros(sums.shape[-1], dtype=jnp.int64)
    for k in range(4):
        lo = sums[k, 0].astype(jnp.uint32).astype(jnp.int64)
        carry = sums[k, 1].astype(jnp.int64) << 32
        # hi16 decodes UNSIGNED: the accumulator can reach 2^31 exactly at
        # the documented 2^31-row bound (2^15 blocks × ≤2^16/block), where a
        # signed astype would mis-reconstruct limb 0 by 2^48; uint32 decode
        # is exact to 2^32 accumulated — 2× margin past the bound.
        h16 = sums[k, 2].astype(jnp.uint32).astype(jnp.int64) << 16
        total = total + ((lo + carry + h16) << (16 * k))
    return total


def minmax_from(minmax):
    """minmax[4, GP] → (min int64[GP], max int64[GP]); empty slots decode
    to int64::max / int64::min (the segment_reduce identities)."""
    def comb(hi, lo_b):
        lo = (lo_b ^ I32MIN).astype(jnp.uint32).astype(jnp.int64)
        return (hi.astype(jnp.int64) << 32) | lo
    return comb(minmax[0], minmax[1]), comb(minmax[2], minmax[3])
