"""Columnar substrate: device-resident batches with validity masks.

This is the TPU-native replacement for the Arrow RecordBatch + validity-bitmap
substrate the reference operates on (SURVEY.md L0; Gandiva evaluates
``RecordBatch → ArrayVector``, libgandiva.pxd:218-226). Design departures, all
deliberate and TPU-first:

- validity is a full ``bool`` lane per row, not a packed bitmap: the VPU operates
  on 8x128 vector registers of lanes; packed bitmaps would force bit-unpacking in
  every kernel. XLA fuses the mask ops into the same loop as the values.
- every column is padded to a multiple of the 128-lane tile; the logical row
  count rides alongside as static Python metadata. Padding rows are marked
  invalid so they are inert under every null-respecting kernel.
- strings/binary are dictionary-encoded at ingest: the device column is an int32
  code array; the dictionary (a pyarrow Array) stays on host. String functions
  are evaluated once per *distinct* value host-side and the result gathered by
  code on device (SURVEY.md §7 "Strings on TPU").
- decimal128 is carried as two int64 limb columns (hi, lo-as-unsigned).

Batch is a pytree, so it can flow through jit/shard_map directly.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import dtypes as dt

LANE = 128           # TPU lane width; last-dim tiling unit
_DEFAULT_PAD = 2048  # pad row counts to the Pallas compaction block multiple


def padded_length(n: int, multiple: int = _DEFAULT_PAD) -> int:
    if n == 0:
        return multiple
    return -(-n // multiple) * multiple


@jax.tree_util.register_pytree_node_class
class Column:
    """One device column: values + validity lane, plus static metadata.

    ``data``      — jnp array, padded physical values (codes for strings,
                    LO limb for decimal128).
    ``validity``  — jnp bool array, same padded shape; False ⇒ NULL.
    ``dtype``     — logical DataType (static / aux data).
    ``dictionary``— host pyarrow Array of distinct values for string/binary
                    columns (static / aux data), else None.
    ``extra``     — secondary device buffer: HI limb for decimal128, else None.
    """

    def __init__(self, data, validity, dtype: dt.DataType, dictionary=None,
                 extra=None):
        self.data = data
        self.validity = validity
        self.dtype = dtype
        self.dictionary = dictionary
        self.extra = extra

    # pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        children = (self.data, self.validity, self.extra)
        aux = (self.dtype, self.dictionary)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, validity, extra = children
        dtype, dictionary = aux
        return cls(data, validity, dtype, dictionary=dictionary, extra=extra)

    # ---------------------------------------------------------------------
    def __repr__(self):
        return (f"Column({self.dtype}, shape={getattr(self.data, 'shape', None)},"
                f" dict={'yes' if self.dictionary is not None else 'no'})")


@jax.tree_util.register_pytree_node_class
class Batch:
    """An ordered set of equal-length Columns + the logical row count.

    ``length`` is static (Python int): recompiles happen per padded capacity,
    not per logical length, because operators mask on a *device* row-count
    scalar where dynamic behavior is needed.
    """

    def __init__(self, columns: Dict[str, Column], length: int):
        self.columns = dict(columns)
        self.length = length

    def tree_flatten(self):
        names = tuple(self.columns.keys())
        children = tuple(self.columns[n] for n in names)
        return children, (names, self.length)

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, length = aux
        return cls(dict(zip(names, children)), length)

    @property
    def capacity(self) -> int:
        if not self.columns:
            return 0
        first = next(iter(self.columns.values()))
        return int(first.data.shape[0])

    def column(self, name: str) -> Column:
        return self.columns[name]

    def __contains__(self, name):
        return name in self.columns

    def __repr__(self):
        return f"Batch(len={self.length}, cols={list(self.columns)})"


# ---------------------------------------------------------------------------
# Arrow <-> device conversion
# ---------------------------------------------------------------------------

def _np_from_arrow(arr) -> Tuple[np.ndarray, np.ndarray, Optional[object]]:
    """Return (values ndarray, validity bool ndarray, dictionary-or-None)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()

    n = len(arr)
    validity = np.ones(n, dtype=bool)
    if arr.null_count:
        from . import native

        validity = native.unpack_bitmap(arr.buffers()[0], arr.offset, n)

    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        darr = pc.dictionary_encode(arr)
        codes = np.asarray(darr.indices.fill_null(0)).astype(np.int32)
        return codes, validity, darr.dictionary
    if pa.types.is_dictionary(t):
        codes = np.asarray(arr.indices.fill_null(0)).astype(np.int32)
        return codes, validity, arr.dictionary
    if pa.types.is_boolean(t):
        vals = np.asarray(arr.fill_null(False))
        return vals, validity, None
    if pa.types.is_decimal(t):
        # handled by column_from_arrow's decimal path (needs two limbs)
        raise AssertionError("decimal arrays route through _decimal_limbs")
    # numeric / temporal: zero-fill nulls then view as numpy
    zero = pa.scalar(0, type=t) if not pa.types.is_floating(t) else pa.scalar(0.0, type=t)
    try:
        filled = arr.fill_null(zero)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        filled = arr
    vals = np.asarray(filled)
    if vals.dtype.kind == "M":  # datetime64 → int64 view
        vals = vals.view(np.int64)
    elif vals.dtype.kind == "m":
        vals = vals.view(np.int64)
    return vals, validity, None


def _decimal_limbs(arr):
    """pyarrow decimal128 array → (lo int64, hi int64, validity bool).
    The arrow buffer is 16-byte little-endian two's complement per value."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(arr)
    validity = np.ones(n, dtype=bool)
    if arr.null_count:
        from . import native

        validity = native.unpack_bitmap(arr.buffers()[0], arr.offset, n)
    buf = arr.buffers()[1]
    raw = np.frombuffer(buf, dtype=np.int64,
                        count=2 * (n + arr.offset))[2 * arr.offset:]
    pairs = raw.reshape(n, 2)
    lo = pairs[:, 0].copy()
    hi = pairs[:, 1].copy()
    lo[~validity] = 0
    hi[~validity] = 0
    return lo, hi, validity


def column_from_arrow(arr, pad_to: Optional[int] = None) -> Column:
    """Convert a pyarrow Array/ChunkedArray into a device Column."""
    import pyarrow as pa

    logical = dt.from_arrow(arr.type)
    if logical.is_decimal:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lo, hi, validity = _decimal_limbs(arr)
        n = len(lo)
        cap = pad_to if pad_to is not None else padded_length(n)
        plo = np.zeros(cap, dtype=np.int64)
        phi = np.zeros(cap, dtype=np.int64)
        pm = np.zeros(cap, dtype=bool)
        plo[:n], phi[:n], pm[:n] = lo, hi, validity
        return Column(jnp.asarray(plo), jnp.asarray(pm), logical,
                      extra=jnp.asarray(phi))
    vals, validity, dictionary = _np_from_arrow(arr)
    n = len(vals)
    cap = pad_to if pad_to is not None else padded_length(n)
    if cap < n:
        raise ValueError(f"pad_to {cap} < length {n}")

    np_dtype = logical.np_dtype
    if vals.dtype != np_dtype:
        vals = vals.astype(np_dtype)
    pv = np.zeros(cap, dtype=np_dtype)
    pv[:n] = vals
    pm = np.zeros(cap, dtype=bool)
    pm[:n] = validity

    # timestamps: gandiva uses millis; normalize arrow timestamp units to ms
    if pa.types.is_timestamp(arr.type) and arr.type.unit != "ms":
        scale = {"s": 1000, "ms": 1, "us": 1 / 1000, "ns": 1 / 1000000}[arr.type.unit]
        if scale >= 1:
            pv[:n] = vals * int(scale)
        else:
            pv[:n] = vals // int(1 / scale)

    return Column(jnp.asarray(pv), jnp.asarray(pm), logical, dictionary=dictionary)


def from_arrow(batch, pad_to: Optional[int] = None) -> Batch:
    """Convert a pyarrow RecordBatch/Table into a device Batch."""
    import pyarrow as pa

    if isinstance(batch, pa.Table):
        batch = batch.combine_chunks()
        names = batch.column_names
        arrays = [batch.column(i) for i in range(batch.num_columns)]
        n = batch.num_rows
    else:
        names = batch.schema.names
        arrays = [batch.column(i) for i in range(batch.num_columns)]
        n = batch.num_rows

    cap = pad_to if pad_to is not None else padded_length(n)
    cols = {name: column_from_arrow(arr, pad_to=cap)
            for name, arr in zip(names, arrays)}
    return Batch(cols, n)


def column_to_arrow(col: Column, length: int):
    """Convert a device Column back to a pyarrow Array (first ``length`` rows)."""
    import pyarrow as pa

    vals = np.asarray(jax.device_get(col.data))[:length]
    mask = ~np.asarray(jax.device_get(col.validity))[:length]  # True ⇒ null

    if col.dtype.is_decimal:
        hi = np.asarray(jax.device_get(col.extra))[:length]
        pairs = np.empty((length, 2), dtype=np.int64)
        pairs[:, 0] = vals
        pairs[:, 1] = hi
        data_buf = pa.py_buffer(np.ascontiguousarray(pairs).tobytes())
        if mask.any():
            validity_buf = pa.array(~mask).buffers()[1]
        else:
            validity_buf = None
        return pa.Array.from_buffers(dt.to_arrow(col.dtype), length,
                                     [validity_buf, data_buf],
                                     null_count=int(mask.sum()))

    if col.dtype.is_varlen:
        codes = pa.array(vals.astype(np.int32), mask=mask, type=pa.int32())
        darr = pa.DictionaryArray.from_arrays(codes, col.dictionary)
        typ = pa.string() if col.dtype.kind is dt.TypeKind.STRING else pa.binary()
        return darr.cast(typ)

    arrow_type = dt.to_arrow(col.dtype)
    if col.dtype.is_temporal:
        # temporal values are physically int32/int64; build as integers and
        # reinterpret-cast to the temporal arrow type
        phys = pa.int32() if vals.dtype == np.int32 else pa.int64()
        base = pa.array(vals, mask=mask, type=phys)
        return base.cast(arrow_type)
    return pa.array(vals, mask=mask, type=arrow_type)


def to_arrow(batch: Batch):
    """Convert a Batch back into a pyarrow RecordBatch."""
    import pyarrow as pa

    arrays = []
    names = []
    for name, col in batch.columns.items():
        arrays.append(column_to_arrow(col, batch.length))
        names.append(name)
    return pa.RecordBatch.from_arrays(arrays, names=names)


def from_numpy(data: Dict[str, np.ndarray],
               validity: Optional[Dict[str, np.ndarray]] = None,
               pad_to: Optional[int] = None) -> Batch:
    """Build a Batch from plain numpy arrays (all-valid unless masks given)."""
    n = len(next(iter(data.values())))
    cap = pad_to if pad_to is not None else padded_length(n)
    cols = {}
    for name, arr in data.items():
        arr = np.asarray(arr)
        logical = _logical_from_np(arr.dtype)
        pv = np.zeros(cap, dtype=arr.dtype)
        pv[:n] = arr
        pm = np.zeros(cap, dtype=bool)
        if validity and name in validity and validity[name] is not None:
            pm[:n] = validity[name]
        else:
            pm[:n] = True
        cols[name] = Column(jnp.asarray(pv), jnp.asarray(pm), logical)
    return Batch(cols, n)


def _logical_from_np(np_dtype) -> dt.DataType:
    m = {
        np.dtype(np.bool_): dt.bool_,
        np.dtype(np.int8): dt.int8,
        np.dtype(np.int16): dt.int16,
        np.dtype(np.int32): dt.int32,
        np.dtype(np.int64): dt.int64,
        np.dtype(np.uint8): dt.uint8,
        np.dtype(np.uint16): dt.uint16,
        np.dtype(np.uint32): dt.uint32,
        np.dtype(np.uint64): dt.uint64,
        np.dtype(np.float32): dt.float32,
        np.dtype(np.float64): dt.float64,
    }
    try:
        return m[np.dtype(np_dtype)]
    except KeyError:
        raise ValueError(f"unsupported numpy dtype {np_dtype}") from None
