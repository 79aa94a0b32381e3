"""Hash registry functions over numeric/temporal columns.

Reference: precompiled/hash.cc + function_registry_hash.cc (SURVEY.md §2b
"Hash") — hash32/hash64 with optional chainable seed, used by callers for
partitioning. Device implementation: utils.hashing (murmur-fmix32 family on
native 32-bit lanes). String variants live in string_ops.py (dictionary
tables). Hash values are engine-defined but deterministic and seed-chainable,
which is the contract partitioning and multi-column hashing rely on.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from ..utils.hashing import hash32, hash64
from .numeric import NUMERIC, TEMPORAL
from .registry import Nullability, Val, global_registry

_R = global_registry()

_HASHABLE = NUMERIC + TEMPORAL + [dt.bool_]


def _hash32_impl(ctx, args):
    seed = jnp.uint32(0)
    if len(args) == 2:
        seed = args[1].value.view(jnp.uint32) if args[1].value.dtype == jnp.int32 \
            else args[1].value.astype(jnp.uint32)
    return hash32(args[0].value, seed).view(jnp.int32)  # 32-bit view is fine


def _hash64_impl(ctx, args):
    seed = jnp.uint64(0)
    if len(args) == 2:
        seed = args[1].value.astype(jnp.uint64)  # wrap-astype: no 64-bit view
    return hash64(args[0].value, seed).astype(jnp.int64)


for _t in _HASHABLE:
    _R.register("hash32", [_t], dt.int32, _hash32_impl, aliases=["hash"])
    _R.register("hash64", [_t], dt.int64, _hash64_impl)
    _R.register("hash32", [_t, dt.int32], dt.int32, _hash32_impl)
    _R.register("hash64", [_t, dt.int64], dt.int64, _hash64_impl)
    # seed-aware variants that keep NULL_IF_NULL default; AsDouble variants
    # mirror gandiva's names (same bits reinterpreted via float formatting)
    _R.register("hash32AsDouble", [_t], dt.float64,
                lambda ctx, args: hash32(args[0].value).astype(jnp.float64))
    _R.register("hash64AsDouble", [_t], dt.float64,
                lambda ctx, args: hash64(args[0].value).astype(jnp.float64))
