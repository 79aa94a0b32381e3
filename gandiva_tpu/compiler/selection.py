"""SelectionVector — typed row-index vectors under static shapes.

Reference: gandiva/selection_vector.h (libgandiva.pxd:43-71): a typed index
vector (UINT16/UINT32/UINT64 modes) produced by Filter and consumed by
Projector, convertible to an Arrow array.

TPU redesign (SURVEY.md §7 step 4): XLA requires static shapes, so a
selection is a ``(indices[capacity], count)`` pair — indices of selected rows
packed to the front (order-preserving), tail filled with 0, plus a device
scalar count. This is the engine-wide idiom for dynamic cardinality; the
operators (join/agg output, shuffle partitions) generalize it.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


class SelectionMode(enum.Enum):
    NONE = "none"
    UINT16 = "uint16"
    UINT32 = "uint32"
    UINT64 = "uint64"


_MODE_DTYPE = {
    SelectionMode.UINT16: jnp.uint16,
    SelectionMode.UINT32: jnp.uint32,
    SelectionMode.UINT64: jnp.uint64,
}


@jax.tree_util.register_pytree_node_class
class SelectionVector:
    """(indices, count) pair; a pytree so it flows through jit."""

    def __init__(self, indices, count, mode: SelectionMode = SelectionMode.UINT32):
        self.indices = indices
        self.count = count
        self.mode = mode

    def tree_flatten(self):
        return (self.indices, self.count), (self.mode,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        indices, count = children
        return cls(indices, count, aux[0])

    @property
    def capacity(self) -> int:
        return int(self.indices.shape[0])

    def __len__(self) -> int:
        """Host-syncing logical count (mirrors SelectionVector GetNumSlots)."""
        return int(jax.device_get(self.count))

    def to_array(self):
        """First ``count`` indices as a pyarrow array (gandiva ToArray,
        gandiva.pyx:174-176)."""
        import pyarrow as pa

        n = len(self)
        idx = np.asarray(jax.device_get(self.indices))[:n]
        pa_type = {SelectionMode.UINT16: pa.uint16(),
                   SelectionMode.UINT32: pa.uint32(),
                   SelectionMode.UINT64: pa.uint64()}[self.mode]
        return pa.array(idx, type=pa_type)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.indices))[:len(self)]

    @staticmethod
    def from_mask(mask, mode: SelectionMode = SelectionMode.UINT32,
                  capacity: int | None = None) -> "SelectionVector":
        """Compact a boolean mask into packed indices (traceable)."""
        from ..ops.compaction import compact_mask

        if mode is SelectionMode.UINT16 and mask.shape[0] > (1 << 16):
            # reference parity: MakeInt16 bounds capacity at construction
            # (libgandiva.pxd:58-71); wrapping would corrupt indices
            raise ValueError(
                "selection mode UINT16 cannot address masks over 65536 "
                f"rows (got {mask.shape[0]})")
        idx, count = compact_mask(mask, capacity=capacity,
                                  index_dtype=_MODE_DTYPE[mode])
        return SelectionVector(idx, count, mode)
