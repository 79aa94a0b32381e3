"""Numeric cast kernels (castINT / castBIGINT / castFLOAT4 / castFLOAT8 …).

Reference: Gandiva registers SQL-style cast names per target type
(function_registry_arithmetic.cc cast entries; names exercised via the
pyarrow registry introspection). Float→integer casts round half away from
zero (Java semantics, matching Gandiva's use of lround), NOT numpy's
truncation or banker's rounding. Temporal and varchar casts live in the
datetime/string modules.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from .numeric import FLOATS, INTS, NUMERIC, _round_half_away
from .registry import global_registry

_R = global_registry()

_CAST_TARGETS = {
    "castTINYINT": dt.int8,
    "castSMALLINT": dt.int16,
    "castINT": dt.int32,
    "castBIGINT": dt.int64,
    "castFLOAT4": dt.float32,
    "castFLOAT8": dt.float64,
}


def _make_cast(target: dt.DataType):
    np_t = jnp.dtype(target.np_dtype)

    def impl(ctx, args):
        a = args[0].value
        src = args[0].dtype
        if src.is_float and target.is_integer:
            return _round_half_away(a).astype(np_t)
        return a.astype(np_t)

    return impl


for _name, _target in _CAST_TARGETS.items():
    _impl = _make_cast(_target)
    for _src in NUMERIC:
        if _src == _target:
            # identity cast still registered (planners emit them)
            _R.register(_name, [_src], _target, _impl)
        else:
            _R.register(_name, [_src], _target, _impl)

# bool → numeric casts (gandiva: castINT(bool) etc. exist via castBIT paths)
for _name, _target in _CAST_TARGETS.items():
    _R.register(_name, [dt.bool_], _target, _make_cast(_target))

# castBIT / castBOOLEAN from numeric
_R.register_many(
    "castBIT", [((t,), dt.bool_) for t in NUMERIC],
    lambda ctx, args: args[0].value != 0, aliases=["castBOOLEAN"])
