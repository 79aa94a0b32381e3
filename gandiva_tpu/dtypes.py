"""Type system for the TPU-native query engine.

Mirrors the Arrow/Gandiva type surface (reference: the 13 typed literal
constructors at pyarrow's ``libgandiva.pxd:112-149`` and the typed IN builders at
``libgandiva.pxd:178-212``), but is designed for the TPU execution model:

- every logical type maps to a *device dtype* (what jnp arrays hold on TPU) and
  an *arrow dtype* (the interchange format at the engine boundary);
- temporal types are carried as integers (the Arrow physical representation);
- strings/binary are dictionary-encoded at ingest (TPU has no byte-wrangling
  advantage; dictionary ids turn string compare/join/group-by into integer
  problems) — the device dtype is the int32 code column;
- decimal128 is carried as a (hi: int64, lo: uint64) pair of columns.

Nothing in this module touches a device.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np


class TypeKind(enum.Enum):
    BOOL = "bool"
    INT8 = "int8"
    INT16 = "int16"
    INT32 = "int32"
    INT64 = "int64"
    UINT8 = "uint8"
    UINT16 = "uint16"
    UINT32 = "uint32"
    UINT64 = "uint64"
    FLOAT32 = "float32"
    FLOAT64 = "float64"
    DATE32 = "date32"        # days since epoch, int32
    DATE64 = "date64"        # millis since epoch, int64
    TIME32 = "time32"        # millis since midnight, int32
    TIME64 = "time64"        # micros since midnight, int64
    TIMESTAMP = "timestamp"  # millis since epoch, int64 (Gandiva uses ms)
    INTERVAL_DAY = "interval_day"      # (days, millis) pair carried as int64
    INTERVAL_YEAR = "interval_year"    # months, int32
    STRING = "string"        # dictionary-encoded utf8
    BINARY = "binary"        # dictionary-encoded bytes
    DECIMAL128 = "decimal128"


_NUMPY_PHYSICAL = {
    TypeKind.BOOL: np.bool_,
    TypeKind.INT8: np.int8,
    TypeKind.INT16: np.int16,
    TypeKind.INT32: np.int32,
    TypeKind.INT64: np.int64,
    TypeKind.UINT8: np.uint8,
    TypeKind.UINT16: np.uint16,
    TypeKind.UINT32: np.uint32,
    TypeKind.UINT64: np.uint64,
    TypeKind.FLOAT32: np.float32,
    TypeKind.FLOAT64: np.float64,
    TypeKind.DATE32: np.int32,
    TypeKind.DATE64: np.int64,
    TypeKind.TIME32: np.int32,
    TypeKind.TIME64: np.int64,
    TypeKind.TIMESTAMP: np.int64,
    TypeKind.INTERVAL_DAY: np.int64,
    TypeKind.INTERVAL_YEAR: np.int32,
    TypeKind.STRING: np.int32,     # dictionary codes
    TypeKind.BINARY: np.int32,     # dictionary codes
    TypeKind.DECIMAL128: np.int64,  # per-limb; see decimal module
}

_INTEGER_KINDS = {
    TypeKind.INT8, TypeKind.INT16, TypeKind.INT32, TypeKind.INT64,
    TypeKind.UINT8, TypeKind.UINT16, TypeKind.UINT32, TypeKind.UINT64,
}
_FLOAT_KINDS = {TypeKind.FLOAT32, TypeKind.FLOAT64}
_TEMPORAL_KINDS = {
    TypeKind.DATE32, TypeKind.DATE64, TypeKind.TIME32, TypeKind.TIME64,
    TypeKind.TIMESTAMP,
}
_VARLEN_KINDS = {TypeKind.STRING, TypeKind.BINARY}


@dataclasses.dataclass(frozen=True)
class DataType:
    """A logical column type. Hashable; used as a registry/signature key."""

    kind: TypeKind
    # decimal parameters (ignored for other kinds)
    precision: int = 0
    scale: int = 0

    def __str__(self) -> str:
        if self.kind is TypeKind.DECIMAL128:
            return f"decimal128({self.precision},{self.scale})"
        return self.kind.value

    __repr__ = __str__

    @property
    def np_dtype(self) -> np.dtype:
        """Physical numpy dtype of the (primary) device buffer."""
        return np.dtype(_NUMPY_PHYSICAL[self.kind])

    @property
    def is_integer(self) -> bool:
        return self.kind in _INTEGER_KINDS

    @property
    def is_float(self) -> bool:
        return self.kind in _FLOAT_KINDS

    @property
    def is_numeric(self) -> bool:
        return self.is_integer or self.is_float or self.kind is TypeKind.DECIMAL128

    @property
    def is_temporal(self) -> bool:
        return self.kind in _TEMPORAL_KINDS

    @property
    def is_varlen(self) -> bool:
        return self.kind in _VARLEN_KINDS

    @property
    def is_decimal(self) -> bool:
        return self.kind is TypeKind.DECIMAL128


# Singleton-style constructors, mirroring pyarrow's factory names.
bool_ = DataType(TypeKind.BOOL)
int8 = DataType(TypeKind.INT8)
int16 = DataType(TypeKind.INT16)
int32 = DataType(TypeKind.INT32)
int64 = DataType(TypeKind.INT64)
uint8 = DataType(TypeKind.UINT8)
uint16 = DataType(TypeKind.UINT16)
uint32 = DataType(TypeKind.UINT32)
uint64 = DataType(TypeKind.UINT64)
float32 = DataType(TypeKind.FLOAT32)
float64 = DataType(TypeKind.FLOAT64)
date32 = DataType(TypeKind.DATE32)
date64 = DataType(TypeKind.DATE64)
time32 = DataType(TypeKind.TIME32)
time64 = DataType(TypeKind.TIME64)
timestamp = DataType(TypeKind.TIMESTAMP)
interval_day = DataType(TypeKind.INTERVAL_DAY)
interval_year = DataType(TypeKind.INTERVAL_YEAR)
string = DataType(TypeKind.STRING)
binary = DataType(TypeKind.BINARY)


def decimal128(precision: int, scale: int) -> DataType:
    if not (0 < precision <= 38):
        raise ValueError(f"decimal precision must be in 1..38, got {precision}")
    return DataType(TypeKind.DECIMAL128, precision=precision, scale=scale)


_BY_NAME = {
    "bool": bool_, "boolean": bool_,
    "int8": int8, "int16": int16, "int32": int32, "int64": int64,
    "uint8": uint8, "uint16": uint16, "uint32": uint32, "uint64": uint64,
    "float": float32, "float32": float32,
    "double": float64, "float64": float64,
    "date32": date32, "date64": date64,
    "time32": time32, "time64": time64,
    "timestamp": timestamp,
    "string": string, "utf8": string, "binary": binary,
}


def from_name(name: str) -> DataType:
    try:
        return _BY_NAME[name]
    except KeyError:
        raise ValueError(f"unknown type name: {name!r}") from None


def from_arrow(at) -> DataType:
    """Map a pyarrow DataType to ours."""
    import pyarrow as pa

    if pa.types.is_boolean(at):
        return bool_
    if pa.types.is_int8(at):
        return int8
    if pa.types.is_int16(at):
        return int16
    if pa.types.is_int32(at):
        return int32
    if pa.types.is_int64(at):
        return int64
    if pa.types.is_uint8(at):
        return uint8
    if pa.types.is_uint16(at):
        return uint16
    if pa.types.is_uint32(at):
        return uint32
    if pa.types.is_uint64(at):
        return uint64
    if pa.types.is_float32(at):
        return float32
    if pa.types.is_float64(at):
        return float64
    if pa.types.is_date32(at):
        return date32
    if pa.types.is_date64(at):
        return date64
    if pa.types.is_time32(at):
        return time32
    if pa.types.is_time64(at):
        return time64
    if pa.types.is_timestamp(at):
        return timestamp
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return string
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return binary
    if pa.types.is_dictionary(at):
        return from_arrow(at.value_type)
    if pa.types.is_decimal(at):
        return decimal128(at.precision, at.scale)
    raise ValueError(f"unsupported arrow type: {at}")


def to_arrow(dt: DataType):
    """Map our DataType to the pyarrow type used at the engine boundary."""
    import pyarrow as pa

    m = {
        TypeKind.BOOL: pa.bool_(),
        TypeKind.INT8: pa.int8(),
        TypeKind.INT16: pa.int16(),
        TypeKind.INT32: pa.int32(),
        TypeKind.INT64: pa.int64(),
        TypeKind.UINT8: pa.uint8(),
        TypeKind.UINT16: pa.uint16(),
        TypeKind.UINT32: pa.uint32(),
        TypeKind.UINT64: pa.uint64(),
        TypeKind.FLOAT32: pa.float32(),
        TypeKind.FLOAT64: pa.float64(),
        TypeKind.DATE32: pa.date32(),
        TypeKind.DATE64: pa.date64(),
        TypeKind.TIME32: pa.time32("ms"),
        TypeKind.TIME64: pa.time64("us"),
        TypeKind.TIMESTAMP: pa.timestamp("ms"),
        TypeKind.STRING: pa.string(),
        TypeKind.BINARY: pa.binary(),
    }
    if dt.kind is TypeKind.DECIMAL128:
        return pa.decimal128(dt.precision, dt.scale)
    return m[dt.kind]


@dataclasses.dataclass(frozen=True)
class Field:
    """A named, typed, nullable column — the schema element.

    Mirrors arrow Field as used by Gandiva's TreeExprBuilder.MakeField
    (libgandiva.pxd:151-153).
    """

    name: str
    dtype: DataType
    nullable: bool = True

    def __str__(self) -> str:
        return f"{self.name}: {self.dtype}"


class Schema:
    """Ordered collection of Fields; the compile-time input contract."""

    def __init__(self, fields):
        self.fields = tuple(fields)
        self._by_name = {f.name: f for f in self.fields}
        if len(self._by_name) != len(self.fields):
            raise ValueError("duplicate field names in schema")

    def field(self, name: str) -> Field:
        try:
            return self._by_name[name]
        except KeyError:
            raise KeyError(f"no field named {name!r} in schema") from None

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def __iter__(self):
        return iter(self.fields)

    def __len__(self):
        return len(self.fields)

    def __eq__(self, other):
        return isinstance(other, Schema) and self.fields == other.fields

    def __hash__(self):
        return hash(self.fields)

    def __str__(self):
        return "schema<" + ", ".join(str(f) for f in self.fields) + ">"

    @staticmethod
    def from_arrow(arrow_schema) -> "Schema":
        return Schema(
            [Field(f.name, from_arrow(f.type), f.nullable) for f in arrow_schema]
        )
