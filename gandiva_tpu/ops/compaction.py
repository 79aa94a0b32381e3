"""Stream compaction: boolean mask → packed row indices (+ payload).

The engine-wide primitive behind SelectionVector production (Filter's hot
loop in the reference writes selected row indices sequentially —
SURVEY.md §3.3). Two formulations, both static-shape:

- ``compact_mask`` / ``compact_values``: exclusive-cumsum + scatter. Lean to
  compile; scatter costs ~7 ns/row on v5e.
- ``compact_sort``: one stable ``lax.sort`` on the 1-bit drop key carrying
  index + payload operands. Measured faster at scale (306 Mrows/s vs 143 at
  16M rows incl. an f64 payload — bench_reference/prof_ops.py) because XLA's
  sort network beats its scatter lowering; 64-bit payloads ride as uint32
  limb pairs (utils/bits.py).

jnp.nonzero(size=...) is avoided deliberately: its lowering blows the 16 MB
VMEM scoped limit on multi-million-row masks.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax



def compact_mask(mask, capacity: Optional[int] = None,
                 index_dtype=jnp.uint32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (indices[capacity], count): positions of True packed to the
    front in ascending order; tail zero-filled."""
    n = mask.shape[0]
    cap = capacity if capacity is not None else n
    inc = mask.astype(jnp.int32)
    pos = jnp.cumsum(inc, dtype=jnp.int32) - inc          # exclusive prefix sum = output slot
    count = pos[-1] + inc[-1] if n > 0 else jnp.int32(0)
    src = jnp.arange(n, dtype=index_dtype)
    slot = jnp.where(mask & (pos < cap), pos, cap)
    out = jnp.zeros((cap + 1,), dtype=index_dtype).at[slot].set(
        src, mode="drop")[:cap]
    return out, count.astype(jnp.int32)


def compact_values(mask, values, capacity: Optional[int] = None):
    """Pack ``values[mask]`` to the front of a capacity-sized buffer.
    Returns (packed[capacity], count)."""
    n = mask.shape[0]
    cap = capacity if capacity is not None else n
    inc = mask.astype(jnp.int32)
    pos = jnp.cumsum(inc, dtype=jnp.int32) - inc
    count = pos[-1] + inc[-1] if n > 0 else jnp.int32(0)
    slot = jnp.where(mask & (pos < cap), pos, cap)
    out = jnp.zeros((cap + 1,) + values.shape[1:], dtype=values.dtype)
    out = out.at[slot].set(values, mode="drop")[:cap]
    return out, count.astype(jnp.int32)


def compact_sort(mask, payload: Sequence = (), index_dtype=jnp.uint32):
    """Sort-based compaction: returns (indices, count, packed_payloads).

    Stable: surviving rows keep their order; tail holds the dropped rows
    (values untouched, just permuted) — slice with ``count`` at the
    boundary. Payload operands are never *compared* (only the 1-bit drop
    key is), so 64-bit payloads ride directly — no limb splitting needed
    (that discipline is for scatter/gather and for sort *keys*).
    """
    n = mask.shape[0]
    drop = jnp.logical_not(mask)
    idx = jnp.arange(n, dtype=index_dtype)
    out = lax.sort((drop, idx) + tuple(payload), num_keys=1, is_stable=True)
    count = jnp.sum(mask, dtype=jnp.int32)
    return out[1], count, list(out[2:])


def compact_best(mask, payload: Sequence = (), index_dtype=jnp.uint32):
    """Backend-dispatching compaction: the Pallas butterfly kernel on TPU
    (measured ~700 Mrows/s device-side at 16M rows vs ~300 for the sort),
    sort-based elsewhere or when shapes don't fit the kernel's block
    multiple. Same contract as compact_sort."""
    import jax

    n = mask.shape[0]
    from .kernels.compaction_pallas import LANE, compact_columns

    # adaptive block size: largest measured-fastest block that divides n
    # (r4 sweep: 64 rows/block > 32 > 16; below 8 the kernel overheads
    # lose to the sort)
    rows = next((r for r in (64, 32, 16, 8) if n % (r * LANE) == 0
                 and n >= r * LANE), None)
    if jax.default_backend() == "tpu" and rows is not None:
        try:
            idx, cols, count = compact_columns(mask, list(payload),
                                               rows_per_block=rows)
            return idx.view(jnp.uint32) if idx.dtype != jnp.uint32 else idx, \
                count, cols
        except (NotImplementedError, ValueError):
            pass
    return compact_sort(mask, payload, index_dtype)
