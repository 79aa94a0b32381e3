"""Hybrid bitonic merge sort — the TPU replacement for ``lax.sort``.

Reference behavior: pyarrow.compute.sort_indices (SURVEY.md §2c, BASELINE
configs[2] — 100M-row 64-bit keys + payload). XLA's own SortOp lowers to a
bitonic network that at 8M+ rows compiles for 20+ minutes and runs at ~20
Mrows/s (NOTES_r1.md); this module implements the same O(n log²n) network
explicitly, split by comparison stride so each level runs at the memory
level it belongs to:

- **intra-block strides (j < W)** run inside Pallas kernels: a block of
  W = R×128 rows lives in VMEM/registers while dozens of compare-exchange
  stages apply as pure VPU ``roll`` + ``select`` ops — one HBM round trip
  buys up to log²(W)/2 stages. Two kernel flavors from one builder:
  *leaf* (phases 1..w: fully sort every block) and *merge-finish* (single
  phase p, strides w-1..0: finish a cross-block merge in-VMEM).
- **cross-block strides (j ≥ W)** run as XLA elementwise passes: reshape to
  [-1, 2, j], lexicographic compare, select — XLA fuses each stage into one
  HBM-bandwidth pass (no Pallas needed; there is no reuse to exploit).

Total HBM round trips for N=2^m, W=2^w:  1 + (m−w)(m−w+1)/2 + (m−w), vs
m(m+1)/2 for a naive stage-per-pass network — ~5× less traffic at 64M rows.

Key encoding: the caller provides uint32 limb columns (most significant
first) whose unsigned lexicographic order is the desired row order (see
ops/sort.normalize_key). Limbs are bias-flipped once to signed int32
(u ^ 2^31) so every in-kernel compare is a plain signed i32 VPU op (Mosaic
has no unsigned vector compares and no i64 at all — utils/bits.py). The row
index rides as the final limb: it makes the comparator a total order, which
(a) lets ``swap = (gt == asc)`` replace separate gt/lt tests and (b) makes
the result STABLE — equal keys keep input order, matching Arrow.
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

LANE = 128
DEFAULT_W_LOG2 = 15          # 32768-row blocks: R=256 sublanes of int32


def _lex_gt(mine: Sequence, partner: Sequence):
    """Strict lexicographic ``mine > partner`` over signed-int32 limbs.
    The trailing row-index limb guarantees no ties."""
    gt = mine[0] > partner[0]
    eq = mine[0] == partner[0]
    for m, p in zip(mine[1:], partner[1:]):
        gt = gt | (eq & (m > p))
        eq = eq & (m == p)
    return gt


def _stage_pairs_leaf(w: int) -> List[Tuple[int, int]]:
    """All (phase p, stride-log q) stages that sort a 2^w block."""
    return [(p, q) for p in range(1, w + 1) for q in range(p - 1, -1, -1)]


def _stage_pairs_finish(p: int, w: int) -> List[Tuple[int, int]]:
    """Intra-block tail of cross-block phase p: strides 2^(w-1)..1."""
    return [(p, q) for q in range(w - 1, -1, -1)]


def _block_kernel(*refs, num_limbs: int, rows: int, stages, w: int,
                  num_cmp=None, local_dirs: bool = False):
    """Run ``stages`` compare-exchange stages on one W-row block in VMEM.

    refs: num_limbs input blocks [rows, LANE] int32, then num_limbs output
    blocks. Directions derive from GLOBAL element indices (block offset =
    program_id * W), so alternating asc/desc subsequences line up across
    blocks exactly as in the monolithic network.

    num_cmp: compare only the first num_cmp limbs (lex); remaining limbs
    are non-compared payload that swaps along (merge_path.py carries).
    Default: all limbs compared (original behavior).

    local_dirs: derive directions from LOCAL element indices instead —
    every block then sorts fully ascending (independent sorted runs for
    merge_path.py) rather than alternating for the global bitonic network.
    """
    if num_cmp is None:
        num_cmp = num_limbs
    i = pl.program_id(0)
    ins = refs[:num_limbs]
    outs = refs[num_limbs:]
    # ROW- and LANE-level iotas, not full [rows, LANE] grids: every routing
    # mask below is a pure row function (stride ≥ 128) or pure lane
    # function (stride < 128), so keeping masks at [rows, 1] / [1, LANE]
    # shapes turns ~6 full-width VPU ops per stage into broadcasts of tiny
    # ones (~35% of total leaf cost at 5 limbs — measured r4)
    r1 = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    c1 = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    # global row index: block*rows + r (fits i32)
    g_row = r1 if local_dirs else i * jnp.int32(rows) + r1

    vals = [ref[...] for ref in ins]

    for p, q in stages:
        j = 1 << q
        # roll shifts pinned to i32: python ints trace as i64 under x64,
        # which tpu.dynamic_rotate rejects (utils/bits.py lane discipline)
        if j >= LANE:
            dj = j // LANE
            bit0 = ((r1 >> (q - 7)) & 1) == 0            # [rows, 1]

            def partner(x, _dj=dj, _b=bit0):
                return jnp.where(_b,
                                 pltpu.roll(x, jnp.int32(rows - _dj), 0),
                                 pltpu.roll(x, jnp.int32(_dj), 0))
        else:
            bit0 = ((c1 >> q) & 1) == 0                  # [1, LANE]

            def partner(x, _j=j, _b=bit0):
                return jnp.where(_b,
                                 pltpu.roll(x, jnp.int32(LANE - _j), 1),
                                 pltpu.roll(x, jnp.int32(_j), 1))

        ps = [partner(v) for v in vals]
        # comparator in int32 0/1 arithmetic: Mosaic cannot lower selects
        # whose BRANCH VALUES are i1 vectors ("unsupported target bitwidth
        # for truncation") — bool conditions selecting int32 are fine
        gt = (vals[0] > ps[0]).astype(jnp.int32)
        eq = (vals[0] == ps[0]).astype(jnp.int32)
        for m_, p_ in zip(vals[1:num_cmp], ps[1:num_cmp]):
            gt = gt | (eq & (m_ > p_).astype(jnp.int32))
            eq = eq & (m_ == p_).astype(jnp.int32)
        b0 = jnp.where(bit0, jnp.int32(1), jnp.int32(0))
        # direction from bit p of the global element index (identical for
        # both partners since p > q); p ≥ 7 reads a row bit, p < 7 a lane
        # bit — both tiny
        if p >= 7:
            asc = 1 - ((g_row >> (p - 7)) & 1)           # [rows, 1]
        else:
            asc = 1 - ((c1 >> p) & 1)                    # [1, LANE]
        # pair-consistent "lower > upper": gt_ab = (gt == b0); swap when it
        # equals the direction bit — two broadcast ops total
        swap = (gt == b0) == (asc > 0)
        vals = [jnp.where(swap, pv, v) for v, pv in zip(vals, ps)]

    for k in range(num_limbs):
        outs[k][...] = vals[k]


def _run_block_stages(vals: List[jnp.ndarray], stages, w: int,
                      interpret: bool, num_cmp=None,
                      local_dirs: bool = False) -> List[jnp.ndarray]:
    """pallas_call wrapper: grid over W-row blocks, stages in VMEM."""
    n = vals[0].shape[0]
    W = 1 << w
    rows = W // LANE
    nb = n // W
    num_limbs = len(vals)

    spec = pl.BlockSpec((1, rows, LANE), lambda i: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)

    def kernel(*refs):
        ins = [r.at[0] for r in refs[:num_limbs]]
        outs = [r.at[0] for r in refs[num_limbs:]]
        _block_kernel(*(tuple(ins) + tuple(outs)), num_limbs=num_limbs,
                      rows=rows, stages=stages, w=w, num_cmp=num_cmp,
                      local_dirs=local_dirs)

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nb, rows, LANE), jnp.int32)
                   for _ in range(num_limbs)],
        grid_spec=pl.GridSpec(grid=(nb,), in_specs=[spec] * num_limbs,
                              out_specs=[spec] * num_limbs),
        interpret=interpret,
    )(*[v.reshape(nb, rows, LANE) for v in vals])
    return [o.reshape(n) for o in outs]


def _xla_stage(vals: List[jnp.ndarray], p: int, q: int) -> List[jnp.ndarray]:
    """One cross-block compare-exchange stage as a fused XLA pass."""
    n = vals[0].shape[0]
    j = 1 << q
    shaped = [v.reshape(n // (2 * j), 2, j) for v in vals]
    a = [s[:, 0, :] for s in shaped]
    b = [s[:, 1, :] for s in shaped]
    gt = _lex_gt(a, b)
    g = shaped[0].shape[0]
    # bit p of the global index == bit (p−q−1) of the pair-group index
    asc = ((jnp.arange(g, dtype=jnp.int32) >> (p - q - 1)) & 1) == 0
    swap = gt == asc[:, None]
    # two-output stack formulation: measured FASTER than a single select
    # against the pair-reversed view (1082 vs 1783 ms at 64M — XLA does not
    # fuse the reversed read)
    na = [jnp.where(swap, y, x) for x, y in zip(a, b)]
    nb_ = [jnp.where(swap, x, y) for x, y in zip(a, b)]
    return [jnp.stack([x, y], axis=1).reshape(n)
            for x, y in zip(na, nb_)]


def bitonic_sort_u32(limbs: Sequence[jnp.ndarray],
                     w_log2: int = DEFAULT_W_LOG2,
                     interpret: bool = False):
    """Stable ascending sort by lexicographic uint32 limb tuples.

    limbs: equal-length 1-D uint32 arrays, most significant first; length
    padded internally to a power of two (max-sentinel rows sort last).
    Returns (perm int32[N], sorted uint32 limb arrays [N]) — gather payloads
    with ``perm``; sorted keys reconstruct from the sorted limbs directly
    (ops/sort.denormalize_key), saving the 64-bit key re-gather.
    """
    n = int(limbs[0].shape[0])
    m = max(1, int(np.ceil(np.log2(max(n, 2)))))
    n_pad = 1 << m
    bias = jnp.uint32(0x8000_0000)

    def to_signed(u):
        return (u.astype(jnp.uint32) ^ bias).view(jnp.int32)

    vals = [to_signed(x) for x in limbs]
    idx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    vals.append(idx)
    if n_pad != n:
        pad = n_pad - n
        imax = jnp.full((pad,), np.int32(2 ** 31 - 1), jnp.int32)
        vals = [jnp.concatenate([v, imax]) for v in vals[:-1]] + [
            jnp.concatenate([idx, jnp.arange(n, n_pad, dtype=jnp.int32)])]

    w = min(w_log2, m)
    if (1 << w) < 1024:
        w = min(10, m)  # floor: one int32 tile (8 sublanes × 128)
    def unbias(v):
        return v[:n].view(jnp.uint32) ^ bias

    if n_pad < 1024:
        # tiny input: the network degenerates — one XLA-stage-only path
        for p in range(1, m + 1):
            for q in range(p - 1, -1, -1):
                vals = _xla_stage(vals, p, q)
        return vals[-1][:n], [unbias(v) for v in vals[:-1]]

    vals = _run_block_stages(vals, _stage_pairs_leaf(w), w, interpret)
    for p in range(w + 1, m + 1):
        for q in range(p - 1, w - 1, -1):
            vals = _xla_stage(vals, p, q)
        vals = _run_block_stages(vals, _stage_pairs_finish(p, w), w,
                                 interpret)
    return vals[-1][:n], [unbias(v) for v in vals[:-1]]


def operands_to_limbs(operands: Sequence[jnp.ndarray]):
    """ops/sort.py operands (unsigned arrays of mixed width, lex order) →
    (uint32 limb list, per-operand limb spans). 64-bit operands split into
    (hi, lo) limbs — utils/bits.py: no 64-bit views on TPU, arithmetic
    splits only. ``spans[i] = (limb_start, limb_count)`` lets callers map
    sorted limbs back to sorted operand values."""
    out: List[jnp.ndarray] = []
    spans: List[Tuple[int, int]] = []
    for op in operands:
        if op.dtype in (jnp.uint64, jnp.int64):
            from ...utils.bits import split_i64

            lo, hi = split_i64(op)
            spans.append((len(out), 2))
            out.append(hi)
            out.append(lo)
        else:
            spans.append((len(out), 1))
            out.append(op.astype(jnp.uint32))
    return out, spans
