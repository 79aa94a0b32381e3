"""Pallas stream-compaction kernel — the engine's hottest primitive.

Replaces the lax.sort-based compaction (ops/compaction.py) on TPU: sorting
16M rows costs ~55 ms; this kernel packs survivors in one linear pass.

Design (two-level, no scatter anywhere):

- Outside the kernel (XLA, cheap): per-block survivor counts and their
  exclusive prefix — each block's output offset.
- Inside the kernel (grid over blocks, TPU grid steps run *sequentially*):
  - each 128-lane chunk computes its within-chunk destinations with ONE
    matmul against an upper-triangular ones matrix (exclusive prefix sum on
    the MXU), then applies the pack as a one-hot matmul (permutation on the
    MXU). 32-bit payload lanes split into 16-bit halves so f32 MACs are
    exact; validity/mask lanes ride as 0/1 floats directly.
  - chunk results concatenate into a VMEM accumulator at running offsets
    (dynamic vector stores);
  - the packed block DMAs to HBM at its global offset. Successive blocks
    overlap-write each other's padding tails — correct *because* the TPU
    grid is sequential (later blocks own later offsets).

Payload convention: every column is a uint32 lane (callers view f32 as
uint32 and split 64-bit columns into limb pairs — utils/bits.py).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8                    # sublanes per int32 vreg
DEFAULT_ROWS = 64          # chunks (sublane rows) per block — swept on v5e
                           # (r4, XLA-side rowoffs): 16→367, 32→456,
                           # 64→554, 128→527 Mrows/s @16M; 256+ fail to
                           # compile (giant static store unroll)
BLOCK = DEFAULT_ROWS * LANE  # 8192 rows per block


def _kernel(offsets_ref, rowoffs_ref, mask_ref, *refs, num_payloads: int,
            rows: int):
    """One grid step: pack one block of ``rows*LANE`` rows.

    refs layout: payload_in × num_payloads, out × num_payloads (ANY/HBM),
    then scratch: accum VMEM [num_payloads, rows*LANE + LANE], offs SMEM,
    copy semaphores.

    rowoffs_ref: [nb, rows(->LANE-padded)] int32 in HBM — each chunk's
    exclusive survivor prefix WITHIN its block, computed in XLA. The
    kernel used to derive it in-kernel and copy it to SMEM with a per-row
    vector→scalar extract loop; DMA-ing the precomputed row HBM→SMEM
    instead (overlapped with the butterfly) plus the r4 block-size resweep
    took the kernel 442 → 554 Mrows/s at 16M. The remaining per-block
    floor is the sequential boundary-tile read→merge→write DMA chain
    (~5-6 us/block): blocks share their first 1024-elem tile with the
    previous block's tail, and the TPU grid serializes the dependency.
    """
    i = pl.program_id(0)
    payload_in = refs[:num_payloads]
    outs = refs[num_payloads:2 * num_payloads]
    # per-payload scratch refs (a single [P, n] scratch cannot be DMA-sliced
    # along the sublane-tiled leading dim)
    accums = refs[2 * num_payloads:3 * num_payloads]
    tmps = refs[3 * num_payloads:4 * num_payloads]   # VMEM [rows, LANE] each
    offs = refs[4 * num_payloads]          # SMEM [rows]
    sem = refs[4 * num_payloads + 1]
    offsem = refs[4 * num_payloads + 2]

    # start the row-offsets DMA first; it lands in SMEM while the butterfly
    # runs
    pltpu.make_async_copy(rowoffs_ref.at[i], offs, offsem).start()

    m = mask_ref[...].astype(jnp.int32)              # [rows, LANE] 0/1
    lane_iota2 = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)

    # exclusive prefix along lanes: Hillis-Steele with static rolls (VPU)
    s = m
    for k in range(7):
        sh = 1 << k
        s = s + jnp.where(lane_iota2 >= sh, pltpu.roll(s, jnp.int32(sh), 1),
                          jnp.zeros_like(s))
    dest = s - m                                     # [rows, LANE]

    # stable pack via LSB-first butterfly routing: validated conflict-free
    # for monotone (compaction) destinations — each stage k swaps position
    # pairs (p, p^2^k) so survivors' position bit k matches dest bit k.
    # Pure static rolls + selects; no matmuls (Mosaic's f32 dot is a single
    # bf16 pass unless forced to a slow 3-pass, and batched matvecs are
    # MXU-latency-bound).
    live = m
    payloads = [payload_in[p][...] for p in range(num_payloads)]

    for k in range(7):
        stride = 1 << k
        bit0 = ((lane_iota2 >> k) & 1) == 0          # am I the low lane?

        def partner(x, _b=bit0, _s=stride):
            return jnp.where(_b, pltpu.roll(x, jnp.int32(LANE - _s), 1),
                             pltpu.roll(x, jnp.int32(_s), 1))

        p_live = partner(live)
        p_dest = partner(dest)
        # all routing logic in int32 0/1 arithmetic: i1 vector converts hit
        # Mosaic's "unsupported target bitwidth for truncation"
        want1 = (dest >> k) & 1
        p_want1 = (p_dest >> k) & 1
        a_live = jnp.where(bit0, live, p_live)
        a_want = jnp.where(bit0, want1, p_want1)
        b_live = jnp.where(bit0, p_live, live)
        b_want = jnp.where(bit0, p_want1, want1)
        A = a_live * a_want * (1 - b_live * b_want)
        Bv = b_live * (1 - b_want) * (1 - a_live * (1 - a_want))
        swap = (A + Bv) > 0
        live = jnp.where(swap, p_live, live)
        dest = jnp.where(swap, p_dest, dest)
        payloads = [jnp.where(swap, partner(x), x) for x in payloads]

    for p in range(num_payloads):
        tmps[p][...] = payloads[p]                   # [rows, LANE] packed

    pltpu.make_async_copy(rowoffs_ref.at[i], offs, offsem).wait()

    # Placement without unaligned stores: a 1-D int32 VMEM ref is tiled in
    # 1024-element vregs, so the only legal dynamic store base is a multiple
    # of 1024. Each chunk therefore lands with ONE masked 2048-wide store at
    # base b = (off ÷ 1024)·1024 (provable via pl.multiple_of): the chunk's
    # 128 lanes sit at flat [off-b, off-b+128) inside that window, the value
    # vector is the lane-rotated row broadcast across the window, and the
    # mask selects the flat window. (lax.div/lax.rem, not // and %:
    # jnp's signed-correction paths feed Mosaic converts it cannot lower.)
    win = 2 * SUB * LANE  # 2048: any 128-run within a 1024-tile fits
    flat_iota = lax.broadcasted_iota(jnp.int32, (2 * SUB, LANE), 0) * LANE \
        + lax.broadcasted_iota(jnp.int32, (2 * SUB, LANE), 1)
    flat_iota = flat_iota.reshape(win)

    # static unroll over chunks (rows is small): dynamic sublane reads in a
    # fori_loop trip Mosaic's convert lowering; static indices do not.
    #
    # HBM DMA offsets must be 1024-tile-aligned too, so the block writes the
    # aligned span [b, b + span) where b = (global_start ÷ 1024)·1024: it
    # first DMAs IN the boundary tile [b, b+1024) (the sequential grid
    # guarantees the previous block's write has completed), places its
    # chunks at t + chunk_offset where t = global_start - b, and DMAs the
    # whole aligned span back OUT. The trailing garbage is overwritten by
    # the next block the same way.
    start = offsets_ref[i]
    tile1024 = jnp.int32(SUB * LANE)
    b = pl.multiple_of(lax.div(start, tile1024) * tile1024, SUB * LANE)
    t = start - b

    for p in range(num_payloads):
        pltpu.make_async_copy(outs[p].at[pl.ds(b, SUB * LANE)],
                              accums[p].at[pl.ds(0, SUB * LANE)],
                              sem.at[jnp.int32(p)]).start()
    for p in range(num_payloads):
        pltpu.make_async_copy(outs[p].at[pl.ds(b, SUB * LANE)],
                              accums[p].at[pl.ds(0, SUB * LANE)],
                              sem.at[jnp.int32(p)]).wait()

    for r in range(rows):
        off = t + offs[r]
        bb = pl.multiple_of(lax.div(off, tile1024) * tile1024, SUB * LANE)
        tt = off - bb
        sh = lax.rem(off, jnp.int32(LANE))
        mask = (flat_iota >= tt) & (flat_iota < tt + LANE)
        for p in range(num_payloads):
            row = tmps[p][r, :].reshape(1, LANE)
            rot = pltpu.roll(row, sh, 1)
            val = jnp.broadcast_to(rot, (2 * SUB, LANE)).reshape(win)
            pltpu.store(accums[p].at[pl.ds(bb, win)], val, mask=mask)

    span = rows * LANE + 3 * SUB * LANE  # multiple of 1024
    for p in range(num_payloads):
        pltpu.make_async_copy(accums[p].at[pl.ds(0, span)],
                              outs[p].at[pl.ds(b, span)],
                              sem.at[jnp.int32(p)]).start()
    for p in range(num_payloads):
        pltpu.make_async_copy(accums[p].at[pl.ds(0, span)],
                              outs[p].at[pl.ds(b, span)],
                              sem.at[jnp.int32(p)]).wait()




def _kernel_fragnet(offsets_ref, mask_ref, *refs, num_payloads: int,
                    rows: int):
    """Fragment-network placement (r4): replaces the per-row masked-store
    loop — the old kernel's dominant cost (~11 of 14.8 us per 8k-row block:
    rows x payloads 2048-wide masked stores) — with fully vectorized
    routing:

    1. lane butterfly packs each 128-chunk (shared with the old kernel);
    2. per-chunk output offsets come from a log-roll exclusive scan of the
       chunk counts ([rows,1] column vectors — no scalar extracts, no
       side-channel rowoffs array);
    3. every chunk rotates right by (offset mod 128) via 7 conditional
       roll stages, then splits into a main fragment (dest row off//128)
       and a wrapped fragment (dest row +1);
    4. fragments route to their destination rows through a log-stage
       shift-up network with additive merge — conflict-free because
       destinations are monotone (equal-dest fragments occupy disjoint
       lanes and carry equal remaining shifts; validated exhaustively in
       numpy, scratch/dbg_fragnet.py);
    5. the block's [rows+16, 128] image merges with the DMA'd boundary
       tile (select on flat position < t) and DMAs out as one span.

    refs: payload_in x num_payloads (VMEM blocks), outs x num_payloads
    (ANY, 2-D [*, LANE]), scratch: accum2d x num_payloads
    ([rows+24, LANE] VMEM), bnd x num_payloads ([8, LANE] VMEM), DMA sems.
    """
    i = pl.program_id(0)
    payload_in = refs[:num_payloads]
    outs = refs[num_payloads:2 * num_payloads]
    accums = refs[2 * num_payloads:3 * num_payloads]
    bnds = refs[3 * num_payloads:4 * num_payloads]
    sem = refs[4 * num_payloads]

    start = offsets_ref[i]
    tile1024 = jnp.int32(SUB * LANE)
    b = pl.multiple_of(lax.div(start, tile1024) * tile1024, SUB * LANE)
    brow = lax.div(b, jnp.int32(LANE))
    t = start - b

    # start the boundary-tile reads early; they land while the butterfly
    # runs (sequential grid: the previous block's span write has completed
    # before this grid step issues its copies)
    for p in range(num_payloads):
        pltpu.make_async_copy(outs[p].at[pl.ds(brow, SUB)], bnds[p],
                              sem.at[jnp.int32(p)]).start()

    m = mask_ref[...].astype(jnp.int32)              # [rows, LANE] 0/1
    lane_iota2 = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)

    s = m
    for k in range(7):
        sh = 1 << k
        s = s + jnp.where(lane_iota2 >= sh, pltpu.roll(s, jnp.int32(sh), 1),
                          jnp.zeros_like(s))
    dest = s - m

    live = m
    payloads = [payload_in[p][...] for p in range(num_payloads)]
    for k in range(7):
        stride = 1 << k
        bit0 = ((lane_iota2 >> k) & 1) == 0

        def partner(x, _b=bit0, _s=stride):
            return jnp.where(_b, pltpu.roll(x, jnp.int32(LANE - _s), 1),
                             pltpu.roll(x, jnp.int32(_s), 1))

        p_live = partner(live)
        p_dest = partner(dest)
        want1 = (dest >> k) & 1
        p_want1 = (p_dest >> k) & 1
        a_live = jnp.where(bit0, live, p_live)
        a_want = jnp.where(bit0, want1, p_want1)
        b_live = jnp.where(bit0, p_live, live)
        b_want = jnp.where(bit0, p_want1, want1)
        A = a_live * a_want * (1 - b_live * b_want)
        Bv = b_live * (1 - b_want) * (1 - a_live * (1 - a_want))
        swap = (A + Bv) > 0
        live = jnp.where(swap, p_live, live)
        dest = jnp.where(swap, p_dest, dest)
        payloads = [jnp.where(swap, partner(x), x) for x in payloads]

    # ---- per-chunk offsets: exclusive log-roll scan over [rows, 1] ------
    ri = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    # lane-127 totals extracted via a roll into lane 0: a direct
    # s[:, 127:128] slice carries lane OFFSET 127 in its Mosaic layout and
    # the downstream [*, 1] concatenate refuses mismatched offsets
    # ("result/input offset mismatch on non-concat dimension", r5)
    cnt = pltpu.roll(s, jnp.int32(1), 1)[:, 0:1]     # [rows, 1] inclusive
    inc = cnt
    k = 1
    while k < rows:
        rolled = pltpu.roll(inc, jnp.int32(k), 0)
        inc = inc + jnp.where(ri >= jnp.int32(k), rolled,
                              jnp.zeros_like(inc))
        k *= 2
    offs = inc - cnt + t                             # [rows, 1]
    rem = lax.rem(offs, jnp.int32(LANE))
    d = lax.div(offs, jnp.int32(LANE))

    # ---- rotate each chunk right by rem (7 conditional roll stages) -----
    arrs = payloads + [live]
    for k in range(7):
        cond = ((rem >> k) & 1) > 0                  # [rows, 1]
        arrs = [jnp.where(cond, pltpu.roll(x, jnp.int32(1 << k), 1), x)
                for x in arrs]
    live_r = arrs[-1]
    c1 = lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    a_m = (c1 >= rem).astype(jnp.int32) * live_r     # main fragment lanes
    b_m = (c1 < rem).astype(jnp.int32) * live_r      # wrapped fragment

    AR = rows + 16
    u = ri - d + jnp.int32(8)                        # shared shift [rows,1]

    def pad_rows(x, top, width):
        z = jnp.zeros((top, width), jnp.int32)
        z2 = jnp.zeros((AR - top - rows, width), jnp.int32)
        return jnp.concatenate([z, x, z2], axis=0)

    def shift_up(P_list, u_pad):
        k = 1
        while k < AR:
            uroll = pltpu.roll(u_pad, jnp.int32(AR - k), 0)
            # stage uses bit log2(k) of the shift values
            bit = lax.div(lax.rem(u_pad, jnp.int32(2 * k)), jnp.int32(k))
            bit_r = lax.div(lax.rem(uroll, jnp.int32(2 * k)), jnp.int32(k))
            stay_c = bit == 0                        # [AR,1] bool
            arr_c = bit_r > 0
            P_list = [jnp.where(arr_c,
                                pltpu.roll(x, jnp.int32(AR - k), 0),
                                jnp.zeros_like(x))
                      + jnp.where(stay_c, x, jnp.zeros_like(x))
                      for x in P_list]
            u_pad = jnp.where(arr_c, uroll, u_pad)
            k *= 2
        return P_list

    fragA = [x * a_m for x in arrs[:num_payloads]]
    fragB = [x * b_m for x in arrs[:num_payloads]]
    uA = pad_rows(u, 8, 1)
    uB = pad_rows(u, 9, 1)
    outA = shift_up([pad_rows(x, 8, LANE) for x in fragA], uA)
    outB = shift_up([pad_rows(x, 9, LANE) for x in fragB], uB)

    # ---- merge the boundary tile, write the image, DMA the span out -----
    for p in range(num_payloads):
        pltpu.make_async_copy(outs[p].at[pl.ds(brow, SUB)], bnds[p],
                              sem.at[jnp.int32(p)]).wait()

    fb = (lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0) * LANE
          + lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1))
    span_rows = rows + 3 * SUB                       # multiple of 8
    for p in range(num_payloads):
        img = outA[p] + outB[p]                      # [AR, LANE]
        head = jnp.where(fb < t, bnds[p][...], img[:SUB, :])
        accums[p][0:SUB, :] = head
        accums[p][SUB:AR, :] = img[SUB:, :]
        pltpu.make_async_copy(accums[p].at[pl.ds(0, span_rows)],
                              outs[p].at[pl.ds(brow, span_rows)],
                              sem.at[jnp.int32(p)]).start()
    for p in range(num_payloads):
        pltpu.make_async_copy(accums[p].at[pl.ds(0, span_rows)],
                              outs[p].at[pl.ds(brow, span_rows)],
                              sem.at[jnp.int32(p)]).wait()


def compact_pallas_u32_fragnet(mask, payloads_u32: Sequence,
                               rows_per_block: int = DEFAULT_ROWS):
    """Fragment-network variant of compact_pallas_u32 (r4-designed, wired
    r5 — VERDICT r4 #3 / ADVICE r4): replaces the per-row masked-store
    placement loop (the old kernel's dominant cost) with fully vectorized
    per-chunk rotation + a monotone shift-merge network; see
    _kernel_fragnet. Same contract as compact_pallas_u32."""
    n = mask.shape[0]
    B = rows_per_block * LANE
    assert n % B == 0, (n, B)
    nb = n // B
    num_payloads = len(payloads_u32)
    rows_total = n // LANE

    m2 = mask.astype(jnp.int32).reshape(nb, rows_per_block, LANE)
    counts = jnp.sum(m2, axis=(1, 2))
    offsets = (jnp.cumsum(counts, dtype=jnp.int32)
               - counts).astype(jnp.int32)
    count = counts.sum()

    AR = rows_per_block + 2 * SUB
    span_rows = rows_per_block + 3 * SUB
    out_rows = rows_total + 4 * SUB

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, rows_per_block, LANE),
                               lambda i, *_: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, rows_per_block, LANE),
                        lambda i, *_: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)] * num_payloads,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * num_payloads,
        scratch_shapes=(
            [pltpu.VMEM((span_rows, LANE), jnp.int32)
             for _ in range(num_payloads)]
            + [pltpu.VMEM((SUB, LANE), jnp.int32)
               for _ in range(num_payloads)]
            + [pltpu.SemaphoreType.DMA((num_payloads,))]),
    )

    def kernel(offsets_ref, mask_ref, *refs):
        mask_r = mask_ref.at[0]
        ins = [r.at[0] for r in refs[:num_payloads]]
        rest = refs[num_payloads:]
        _kernel_fragnet(offsets_ref, mask_r,
                        *(tuple(ins) + tuple(rest)),
                        num_payloads=num_payloads, rows=rows_per_block)

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((out_rows, LANE), jnp.int32)]
        * num_payloads,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, m2, *[p.reshape(nb, rows_per_block, LANE)
                     for p in payloads_u32])
    return [o.reshape(out_rows * LANE)[:n] for o in outs], \
        count.astype(jnp.int32)


def compact_pallas_u32(mask, payloads_u32: Sequence,
                       rows_per_block: int = DEFAULT_ROWS):
    """Pack ``payloads_u32[i][mask]`` to the front; returns (packed list,
    count). All payloads must be uint32 lanes of the same length, a multiple
    of rows_per_block*128."""
    n = mask.shape[0]
    B = rows_per_block * LANE
    assert n % B == 0, (n, B)
    nb = n // B
    num_payloads = len(payloads_u32)

    m2 = mask.astype(jnp.int32).reshape(nb, rows_per_block, LANE)
    chunk_cnt = jnp.sum(m2, axis=2)                       # [nb, rows]
    rowoffs = (jnp.cumsum(chunk_cnt, axis=1, dtype=jnp.int32)
               - chunk_cnt).astype(jnp.int32)
    # pad the row dim to LANE: DMA slices must be 128-aligned
    rpad = ((rows_per_block + LANE - 1) // LANE) * LANE
    if rpad != rows_per_block:
        rowoffs = jnp.concatenate(
            [rowoffs, jnp.zeros((nb, rpad - rows_per_block), jnp.int32)],
            axis=1)
    counts = jnp.sum(chunk_cnt, axis=1)
    offsets = (jnp.cumsum(counts, dtype=jnp.int32)
               - counts).astype(jnp.int32)
    count = counts.sum()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        # index-map zeros derive from i so they stay int32 — python-int
        # literals lower as i64 under x64, which Mosaic cannot legalize
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((1, rows_per_block, LANE),
                        lambda i, *_: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, rows_per_block, LANE),
                        lambda i, *_: (i, i * 0, i * 0),
                        memory_space=pltpu.VMEM)] * num_payloads,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * num_payloads,
        scratch_shapes=(
            [pltpu.VMEM((rows_per_block * LANE + 3 * 1024,), jnp.int32)
             for _ in range(num_payloads)]
            + [pltpu.VMEM((rows_per_block, LANE), jnp.int32)
               for _ in range(num_payloads)]
            + [pltpu.SMEM((rpad,), jnp.int32),
               pltpu.SemaphoreType.DMA((num_payloads,)),
               pltpu.SemaphoreType.DMA(())]),
    )

    def kernel(offsets_ref, rowoffs_ref, mask_ref, *refs):
        mask_r = mask_ref.at[0]
        ins = [r.at[0] for r in refs[:num_payloads]]
        rest = refs[num_payloads:]
        _kernel(offsets_ref, rowoffs_ref, mask_r, *(tuple(ins) + tuple(rest)),
                num_payloads=num_payloads, rows=rows_per_block)

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n + 4 * 1024,), jnp.int32)]
        * num_payloads,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, rowoffs, m2,
      *[p.reshape(nb, rows_per_block, LANE) for p in payloads_u32])
    return [o[:n] for o in outs], count.astype(jnp.int32)


def compact_columns(mask, columns: Sequence, with_indices: bool = True,
                    rows_per_block: int = DEFAULT_ROWS):
    """High-level wrapper: pack arbitrary-dtype columns (64-bit splits into
    limb pairs) plus, optionally, the packed row indices.

    Returns (indices_u32 or None, packed columns, count)."""
    from ...utils.bits import explode, rebuild

    n = mask.shape[0]
    lanes = []
    shapes = []
    if with_indices:
        idx = lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
        lanes.append(idx)  # viewed int32 below with every other lane
    for col in columns:
        parts = explode(col)
        shapes.append((col.dtype, len(parts)))
        for p in parts:
            if p.dtype == jnp.float32:
                p = p.view(jnp.uint32)
            elif p.dtype != jnp.uint32:
                p = p.astype(jnp.int32).view(jnp.uint32) \
                    if p.dtype in (jnp.int8, jnp.int16, jnp.int32,
                                   jnp.bool_) else p.view(jnp.uint32)
            lanes.append(p)
    lanes = [l.view(jnp.int32) for l in lanes]
    packed, count = compact_pallas_u32(mask, lanes, rows_per_block)
    packed = [p.view(jnp.uint32) for p in packed]
    pos = 0
    indices = None
    if with_indices:
        indices = packed[0]
        pos = 1
    out_cols = []
    for dtype, k in shapes:
        parts = packed[pos:pos + k]
        pos += k
        d = jnp.dtype(dtype)
        if k == 2:
            if d == jnp.dtype(jnp.float64):
                parts = [p.view(jnp.float32) for p in parts] \
                    if not _cpu_limbs() else parts
            out_cols.append(rebuild(parts, dtype))
        else:
            p = parts[0]
            if d == jnp.dtype(jnp.float32):
                out_cols.append(p.view(jnp.float32))
            elif d == jnp.dtype(jnp.bool_):
                out_cols.append(p.view(jnp.int32).astype(jnp.bool_))
            elif d in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16),
                       jnp.dtype(jnp.int32)):
                out_cols.append(p.view(jnp.int32).astype(d))
            else:
                out_cols.append(p.view(d))
    return indices, out_cols, count


def _cpu_limbs() -> bool:
    from ...utils.bits import _backend_has_true_f64

    return _backend_has_true_f64()
