"""Stream compaction: boolean mask → packed row indices.

The engine-wide primitive behind SelectionVector production (Filter's hot
loop in the reference writes selected row indices sequentially —
SURVEY.md §3.3; under XLA's static shapes this becomes cumsum + scatter).
jnp.nonzero(size=...) is avoided deliberately: its XLA lowering goes through a
variadic sort/reduce-window path that blows the 16 MB VMEM scoped limit on
TPU for multi-million-row masks; an explicit exclusive-cumsum + scatter
compiles lean and is the speed-of-light formulation (one pass over the mask,
one scatter of the survivors).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def compact_mask(mask, capacity: Optional[int] = None,
                 index_dtype=jnp.uint32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (indices[capacity], count): positions of True packed to the
    front in ascending order; tail zero-filled."""
    n = mask.shape[0]
    cap = capacity if capacity is not None else n
    inc = mask.astype(jnp.int32)
    pos = jnp.cumsum(inc) - inc          # exclusive prefix sum = output slot
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
    pos = jnp.cumsum(inc) - inc
    count = pos[-1] + inc[-1] if n > 0 else jnp.int32(0)
    slot = jnp.where(mask & (pos < cap), pos, cap)
    out = jnp.zeros((cap + 1,) + values.shape[1:], dtype=values.dtype)
    out = out.at[slot].set(values, mode="drop")[:cap]
    return out, count.astype(jnp.int32)
