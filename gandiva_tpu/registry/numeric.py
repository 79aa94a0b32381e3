"""Arithmetic / comparison / boolean / math kernels.

TPU-native counterpart of Gandiva's precompiled scalar kernels
(precompiled/arithmetic_ops.cc, extended_math_ops.cc, bit wise ops — SURVEY.md
§2a#6) and the registry tables that expose them
(function_registry_arithmetic.cc, _math_ops.cc). Each entry here is a
vectorized jnp function over whole columns; XLA fuses chains of them into a
single TPU loop, playing the role of Gandiva's LLVM inlining.

Semantics notes (pinned to the reference's C semantics, not numpy's):
- integer divide/mod truncate toward zero (C) → ``lax.div``/``lax.rem``,
  not jnp's flooring ``//``;
- integer overflow wraps (two's complement), matching C++;
- divide-by-zero: Gandiva raises a runtime error at Evaluate; a TPU kernel
  cannot raise, so by default integer x/0 yields 0 and float x/0 yields ±inf.
  ``Configuration(raise_errors=True)`` restores the reference contract: the
  plan carries a per-batch device error flag and the host raises
  ``EvaluationError("divide by zero error")`` at the Evaluate boundary
  (r5, VERDICT r4 #7);
- float→int casts in the cast module round half away from zero (Java/Gandiva
  ``lround`` semantics), unlike numpy's banker's rounding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

from .. import dtypes as dt
from .registry import Nullability, Val, global_registry

_R = global_registry()

NUMERIC = [dt.int8, dt.int16, dt.int32, dt.int64,
           dt.uint8, dt.uint16, dt.uint32, dt.uint64,
           dt.float32, dt.float64]
SIGNED_INT = [dt.int8, dt.int16, dt.int32, dt.int64]
INTS = [dt.int8, dt.int16, dt.int32, dt.int64,
        dt.uint8, dt.uint16, dt.uint32, dt.uint64]
FLOATS = [dt.float32, dt.float64]
TEMPORAL = [dt.date32, dt.date64, dt.time32, dt.time64, dt.timestamp]
ORDERED = NUMERIC + TEMPORAL          # types supporting <, > etc. natively
EQ_ONLY_EXTRA = [dt.bool_]


def _same2(types, ret=None):
    """[(t, t) -> ret or t] combos."""
    return [((t, t), ret if ret is not None else t) for t in types]


def _un(types, ret=None):
    return [((t,), ret if ret is not None else t) for t in types]


# --------------------------------------------------------------------------
# arithmetic  (reference: precompiled/arithmetic_ops.cc)
# --------------------------------------------------------------------------

def _wrap2(f):
    return lambda ctx, args: f(args[0].value, args[1].value)


def _wrap1(f):
    return lambda ctx, args: f(args[0].value)


_R.register_many("add", _same2(NUMERIC), _wrap2(lambda a, b: a + b))
_R.register_many("subtract", _same2(NUMERIC), _wrap2(lambda a, b: a - b))
_R.register_many("multiply", _same2(NUMERIC), _wrap2(lambda a, b: a * b))


def rows_evaluated(args):
    """Rows whose inputs are all non-null — the rows whose errors count
    toward Configuration.raise_errors (null rows never execute the
    reference's kernel body, so they cannot raise)."""
    valid = None
    for a in args:
        if a.validity is None:
            continue
        valid = a.validity if valid is None else (valid & a.validity)
    return True if valid is None else valid


def _divide(ctx, args):
    a, b = args[0].value, args[1].value
    if args[0].dtype.is_float:
        return a / b
    ctx.add_error((b == 0) & rows_evaluated(args), "divide by zero error")
    safe_b = jnp.where(b == 0, jnp.ones_like(b), b)
    return jnp.where(b == 0, jnp.zeros_like(a), lax.div(a, safe_b))


_R.register_many("divide", _same2(NUMERIC), _divide, aliases=["div"])


def _mod(ctx, args):
    a, b = args[0].value, args[1].value
    if args[0].dtype.is_float:
        return jnp.fmod(a, b)
    ctx.add_error((b == 0) & rows_evaluated(args), "divide by zero error")
    safe_b = jnp.where(b == 0, jnp.ones_like(b), b)
    return jnp.where(b == 0, jnp.zeros_like(a), lax.rem(a, safe_b))


_R.register_many("mod", _same2(INTS + FLOATS), _mod, aliases=["modulo", "%"])

_R.register_many("negative", _un(SIGNED_INT + FLOATS),
                 _wrap1(lambda a: -a))
_R.register_many("positive", _un(NUMERIC), _wrap1(lambda a: a))
_R.register_many("abs", _un(SIGNED_INT + FLOATS), _wrap1(jnp.abs))
_R.register_many("abs", _un([dt.uint8, dt.uint16, dt.uint32, dt.uint64]),
                 _wrap1(lambda a: a))

_R.register_many("bitwise_and", _same2(INTS), _wrap2(lambda a, b: a & b))
_R.register_many("bitwise_or", _same2(INTS), _wrap2(lambda a, b: a | b))
_R.register_many("bitwise_xor", _same2(INTS), _wrap2(lambda a, b: a ^ b))
_R.register_many("bitwise_not", _un(INTS), _wrap1(lambda a: ~a))
_R.register_many("shift_left", _same2(INTS), _wrap2(lambda a, b: a << b))
_R.register_many("shift_right", _same2(INTS), _wrap2(lambda a, b: a >> b))

# pow: gandiva registers power(float64, float64)
_R.register_many("power", _same2(FLOATS), _wrap2(lambda a, b: jnp.power(a, b)),
                 aliases=["pow"])


# --------------------------------------------------------------------------
# comparison  (registry tables: function_registry_arithmetic.cc comparisons)
# --------------------------------------------------------------------------

def _register_cmp(name, f, aliases=()):
    _R.register_many(name, _same2(ORDERED, dt.bool_), _wrap2(f), aliases=aliases)
    # bool supports equality only — gandiva exposes equal on bool too
    if name in ("equal", "not_equal"):
        _R.register_many(name, _same2(EQ_ONLY_EXTRA, dt.bool_), _wrap2(f),
                         aliases=aliases)


_register_cmp("equal", lambda a, b: a == b, aliases=["eq", "same", "=="])
_register_cmp("not_equal", lambda a, b: a != b, aliases=["ne", "!="])
_register_cmp("less_than", lambda a, b: a < b, aliases=["lt", "<"])
_register_cmp("less_than_or_equal_to", lambda a, b: a <= b,
              aliases=["le", "lte", "<="])
_register_cmp("greater_than", lambda a, b: a > b, aliases=["gt", ">"])
_register_cmp("greater_than_or_equal_to", lambda a, b: a >= b,
              aliases=["ge", "gte", ">="])


# --------------------------------------------------------------------------
# boolean & null-inspection  (NULL_NEVER kernels)
# --------------------------------------------------------------------------

_R.register(
    "not", [dt.bool_], dt.bool_,
    lambda ctx, args: jnp.logical_not(args[0].value))


def _ref_arr(v):
    # decimals carry (hi, lo) limb tuples
    return v.value[0] if isinstance(v.value, tuple) else v.value


def _isnull(ctx, args):
    v = args[0]
    if v.validity is None:
        out = jnp.zeros(_ref_arr(v).shape, dtype=bool)
    else:
        out = jnp.logical_not(v.validity)
    return Val(out, None, dt.bool_)


def _isnotnull(ctx, args):
    v = args[0]
    if v.validity is None:
        out = jnp.ones(_ref_arr(v).shape, dtype=bool)
    else:
        out = v.validity
    return Val(out, None, dt.bool_)


def _istrue(ctx, args):
    v = args[0]
    val = v.value if v.validity is None else jnp.logical_and(v.value, v.validity)
    return Val(val, None, dt.bool_)


def _isfalse(ctx, args):
    v = args[0]
    val = jnp.logical_not(v.value)
    if v.validity is not None:
        val = jnp.logical_and(val, v.validity)
    return Val(val, None, dt.bool_)


def _isnottrue(ctx, args):
    r = _istrue(ctx, args)
    return Val(jnp.logical_not(r.value), None, dt.bool_)


def _isnotfalse(ctx, args):
    r = _isfalse(ctx, args)
    return Val(jnp.logical_not(r.value), None, dt.bool_)


for _t in NUMERIC + TEMPORAL + [dt.bool_, dt.string, dt.binary]:
    _R.register("isnull", [_t], dt.bool_, _isnull,
                nullability=Nullability.NULL_NEVER)
    _R.register("isnotnull", [_t], dt.bool_, _isnotnull,
                nullability=Nullability.NULL_NEVER)

_R.register("istrue", [dt.bool_], dt.bool_, _istrue,
            nullability=Nullability.NULL_NEVER)
_R.register("isfalse", [dt.bool_], dt.bool_, _isfalse,
            nullability=Nullability.NULL_NEVER)
_R.register("isnottrue", [dt.bool_], dt.bool_, _isnottrue,
            nullability=Nullability.NULL_NEVER)
_R.register("isnotfalse", [dt.bool_], dt.bool_, _isnotfalse,
            nullability=Nullability.NULL_NEVER)


def _is_distinct_from(ctx, args):
    a, b = args[0], args[1]
    av = a.validity if a.validity is not None else jnp.ones_like(a.value, dtype=bool)
    bv = b.validity if b.validity is not None else jnp.ones_like(b.value, dtype=bool)
    neq = a.value != b.value
    out = jnp.where(av & bv, neq, av != bv)
    return Val(out, None, dt.bool_)


def _is_not_distinct_from(ctx, args):
    r = _is_distinct_from(ctx, args)
    return Val(jnp.logical_not(r.value), None, dt.bool_)


for _t in NUMERIC + TEMPORAL + [dt.bool_]:
    _R.register("is_distinct_from", [_t, _t], dt.bool_, _is_distinct_from,
                nullability=Nullability.NULL_NEVER)
    _R.register("is_not_distinct_from", [_t, _t], dt.bool_,
                _is_not_distinct_from, nullability=Nullability.NULL_NEVER)


def _nvl(ctx, args):
    """nvl(a, b): a if a is not null else b (NULL_INTERNAL)."""
    a, b = args[0], args[1]
    av = a.validity if a.validity is not None else jnp.ones_like(a.value, dtype=bool)
    out = jnp.where(av, a.value, b.value)
    if b.validity is None:
        outv = None
    else:
        outv = jnp.where(av, True, b.validity)
    return Val(out, outv, a.dtype)


for _t in NUMERIC + TEMPORAL + [dt.bool_]:
    _R.register("nvl", [_t, _t], _t, _nvl,
                nullability=Nullability.NULL_INTERNAL, aliases=["coalesce2"])


# --------------------------------------------------------------------------
# math  (reference: precompiled/extended_math_ops.cc)
# --------------------------------------------------------------------------

def _to_f64(a):
    return a.astype(jnp.float64)


def _mathfn(f):
    def impl(ctx, args):
        return f(_to_f64(args[0].value))
    return impl


_MATH1 = {
    "sqrt": jnp.sqrt, "cbrt": jnp.cbrt, "exp": jnp.exp,
    "log": jnp.log, "log10": jnp.log10, "log2": jnp.log2,
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "degrees": jnp.degrees, "radians": jnp.radians,
}

for _name, _f in _MATH1.items():
    _R.register_many(_name, _un(NUMERIC, dt.float64), _mathfn(_f))

_R.register_many("atan2", _same2(FLOATS, dt.float64),
                 _wrap2(lambda a, b: jnp.arctan2(_to_f64(a), _to_f64(b))))

# log(base, x) — gandiva's two-arg log
_R.register_many("log", _same2(FLOATS, dt.float64),
                 _wrap2(lambda b, x: jnp.log(_to_f64(x)) / jnp.log(_to_f64(b))))

_R.register("pi", [], dt.float64, lambda ctx, args: jnp.float64(np.pi))


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _round1(ctx, args):
    a = args[0].value
    if args[0].dtype.is_integer:
        return a
    return _round_half_away(a).astype(a.dtype)


_R.register_many("round", _un(NUMERIC), _round1)


def _round2(ctx, args):
    a, nd = args[0].value, args[1]
    if not nd.is_literal:
        scale = jnp.power(10.0, nd.value.astype(jnp.float64))
    else:
        scale = 10.0 ** int(nd.literal)
    if args[0].dtype.is_integer:
        # round to -ndigits positions left of decimal point
        if nd.is_literal and int(nd.literal) >= 0:
            return a
        return (_round_half_away(a.astype(jnp.float64) * scale) / scale).astype(a.dtype)
    return (_round_half_away(a.astype(jnp.float64) * scale) / scale).astype(a.dtype)


for _t in NUMERIC:
    _R.register("round", [_t, dt.int32], _t, _round2)


def _truncate2(ctx, args):
    a, nd = args[0].value, args[1]
    scale = 10.0 ** int(nd.literal) if nd.is_literal else \
        jnp.power(10.0, nd.value.astype(jnp.float64))
    return (jnp.trunc(a.astype(jnp.float64) * scale) / scale).astype(a.dtype)


def _truncate1(ctx, args):
    a = args[0].value
    if args[0].dtype.is_integer:
        return a
    return jnp.trunc(a).astype(a.dtype)


_R.register_many("truncate", _un(NUMERIC), _truncate1, aliases=["trunc"])
for _t in NUMERIC:
    _R.register("truncate", [_t, dt.int32], _t, _truncate2, aliases=["trunc"])

_R.register_many("ceiling", _un(FLOATS), _wrap1(jnp.ceil), aliases=["ceil"])
_R.register_many("floor", _un(FLOATS), _wrap1(jnp.floor))
_R.register_many("sign", _un(SIGNED_INT + FLOATS), _wrap1(jnp.sign))


# --------------------------------------------------------------------------
# random  (reference holder: random_generator_holder.cc — stateful per-call)
# --------------------------------------------------------------------------

def _random(ctx, args):
    key = ctx.random_key()
    u = jax.random.uniform(key, shape=(ctx.capacity,), dtype=jnp.float64)
    return Val(u, None, dt.float64)


_R.register("random", [], dt.float64, _random,
            nullability=Nullability.NULL_NEVER, aliases=["rand"])
_R.register("random", [dt.int32], dt.float64, _random,
            nullability=Nullability.NULL_NEVER, aliases=["rand"])
