"""ExprDecomposer — lowers expression trees to (value, validity) jnp pairs.

This is the TPU-native equivalent of Gandiva's null-semantics engine
(expr_decomposer.cc, SURVEY.md §2a#4): every node decomposes into a value
array and a validity (non-null mask) array, with the reference's rules:

- default (NULL_IF_NULL): output validity = AND of input validities;
- if/else: a NULL condition takes the else branch; result validity follows the
  branch actually taken (verified null propagation: pyarrow
  tests/test_gandiva.py:330-373);
- boolean and/or: Kleene short-circuit — ``false AND null = false``,
  ``true OR null = true``, otherwise null if any input null;
- IN: membership over a literal set, validity propagated from the eval subtree.

Where Gandiva emits an LLVM row loop per expression, we build one jnp
expression DAG over whole columns; XLA fuses it into a single TPU program.
Decomposition happens inside the traced function (zero runtime cost), and the
host-side "holder" tables (LIKE/IN-on-strings/dictionary ranks; Gandiva's
function holders, SURVEY.md §2a#7) are threaded in through TraceContext.
"""
from __future__ import annotations

import dataclasses
from functools import reduce
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import dtypes as dt
from ..expr.nodes import (BooleanNode, FieldNode, FunctionNode, IfNode,
                          InNode, LiteralNode, Node)
from ..registry.registry import (ExpressionValidationError, Nullability, Val,
                                 global_registry)


class TraceContext:
    """Per-trace state handed to registry kernels.

    ``tables`` — device arrays produced by host thunks at evaluate time, in
    registration order. During the *discovery* pass (eager, tiny batch) the
    thunks run immediately; during traced runs the pre-computed arrays are
    consumed positionally.
    """

    def __init__(self, capacity: int, length, columns: Dict[str, Val],
                 tables: Optional[List[Any]] = None,
                 batch=None, rng_key=None, schema=None,
                 check_errors: bool = False):
        self.capacity = capacity
        self.schema = schema            # plan schema (prepass fallbacks)
        self.length = length            # device scalar (row count)
        self.columns = columns
        self.batch = batch              # host Batch (discovery pass only)
        self.thunks: List[Callable] = []    # host: (batch) -> np.ndarray
        self._tables = tables           # traced arrays (traced pass only)
        self._table_idx = 0
        self._rng_key = rng_key
        self._rng_count = 0
        # runtime-error surface (Configuration.raise_errors): kernels record
        # per-row error predicates; the plan reduces them to one device code
        self.check_errors = check_errors
        self.error_flags: List[Any] = []
        self.error_messages: List[str] = []

    @property
    def discovering(self) -> bool:
        return self._tables is None

    def add_table(self, thunk: Callable, cache_on_dicts: bool = False):
        """Register a host table builder; returns its device array.

        ``thunk(batch) -> np.ndarray`` — runs on host per evaluate call
        (per *batch*, so dictionary-dependent tables track each batch's
        dictionaries, the analogue of Gandiva holders being rebuilt per
        compile).

        ``cache_on_dicts=True`` declares the thunk a pure function of the
        batch's DICTIONARIES (not codes/values): the plan then memoizes
        its result and skips the rebuild while every dictionary object is
        identical (VERDICT r3 #9 — steady-state streams re-sending the
        same dictionaries paid a per-batch host tax the reference's
        compile-once holders do not).
        """
        thunk._cache_on_dicts = cache_on_dicts
        self.thunks.append(thunk)
        if self.discovering:
            return jnp.asarray(thunk(self.batch))
        arr = self._tables[self._table_idx]
        self._table_idx += 1
        return arr

    def random_key(self):
        self._rng_count += 1
        if self._rng_key is None:
            return jax.random.PRNGKey(self._rng_count)
        return jax.random.fold_in(self._rng_key, self._rng_count)

    def row_mask(self):
        idx = jnp.arange(self.capacity)
        return idx < self.length

    def add_error(self, row_has_error, message: str) -> None:
        """Record a per-row runtime-error predicate (Status parity: the
        reference raises from Evaluate, e.g. "divide by zero error" on
        integer x/0 — SURVEY.md §5.3). A no-op unless the plan's
        Configuration enables ``raise_errors``, so the default path pays
        nothing. Rows past ``length`` never error."""
        if not self.check_errors:
            return
        mask = jnp.broadcast_to(row_has_error, (self.capacity,)) \
            & self.row_mask()
        self.error_messages.append(message)
        self.error_flags.append(jnp.any(mask))

    def error_code(self):
        """Reduce recorded error flags to one int32 device scalar: 0 = ok,
        i+1 = index of the FIRST (in registration order) firing error."""
        code = jnp.zeros((), jnp.int32)
        for i, f in enumerate(self.error_flags):
            code = jnp.where((code == 0) & f, jnp.int32(i + 1), code)
        return code


def _and_validity(vals: List[Optional[Any]]):
    vs = [v for v in vals if v is not None]
    if not vs:
        return None
    return reduce(jnp.logical_and, vs)


def _as_valid_mask(v: Val, capacity: int):
    if v.validity is None:
        return jnp.ones((capacity,), dtype=bool)
    return jnp.broadcast_to(v.validity, (capacity,))


class ExprDecomposer:
    def __init__(self, ctx: TraceContext):
        self.ctx = ctx
        self.registry = global_registry()

    def decompose(self, node: Node) -> Val:
        if isinstance(node, LiteralNode):
            return self._literal(node)
        if isinstance(node, FieldNode):
            return self._field(node)
        if isinstance(node, FunctionNode):
            return self._function(node)
        if isinstance(node, IfNode):
            return self._if(node)
        if isinstance(node, BooleanNode):
            return self._boolean(node)
        if isinstance(node, InNode):
            return self._in(node)
        raise ExpressionValidationError(f"unknown node type {type(node).__name__}")

    # ------------------------------------------------------------------
    def _literal(self, node: LiteralNode) -> Val:
        d = node.dtype
        if node.value is None:
            if d.is_decimal:
                z = jnp.zeros((), dtype=jnp.int64)
                return Val((z, z), jnp.zeros((self.ctx.capacity,), dtype=bool),
                           d, literal=None, is_literal=True)
            zero = jnp.zeros((), dtype=d.np_dtype)
            return Val(zero, jnp.zeros((self.ctx.capacity,), dtype=bool), d,
                       literal=None, is_literal=True)
        if d.is_decimal:
            unscaled = int(node.value)
            hi = unscaled >> 64
            lo = unscaled & 0xFFFF_FFFF_FFFF_FFFF
            if lo >= 1 << 63:
                lo -= 1 << 64
            return Val((jnp.int64(hi), jnp.int64(lo)), None, d,
                       literal=node.value, is_literal=True)
        if d.is_varlen:
            # device value filled in lazily by consumers via dictionary
            # tables; carry the python literal.
            return Val(None, None, d, literal=node.value, is_literal=True)
        v = jnp.asarray(np.asarray(node.value, dtype=d.np_dtype))
        return Val(v, None, d, literal=node.value, is_literal=True)

    def _field(self, node: FieldNode) -> Val:
        name = node.field.name
        if name not in self.ctx.columns:
            raise ExpressionValidationError(
                f"field {name!r} not found in input batch")
        v = self.ctx.columns[name]
        if v.dtype != node.field.dtype:
            raise ExpressionValidationError(
                f"field {name!r}: schema says {node.field.dtype}, "
                f"batch has {v.dtype}")
        return v

    def _function(self, node: FunctionNode) -> Val:
        args = [self.decompose(a) for a in node.args]
        arg_types = [a.dtype for a in args]
        # castVARCHAR over a COMPUTED numeric/decimal value: the dictionary
        # route needs a direct column reference; fall back to a host
        # prepass that evaluates the numeric subtree with its own compiled
        # projector and re-dictionarizes per row (VERDICT r3 #5 — the
        # reference formats per row and has no such cliff)
        if (node.name == "castVARCHAR" and args
                and (arg_types[0].is_integer or arg_types[0].is_decimal
                     or arg_types[0].kind in (dt.TypeKind.FLOAT32,
                                              dt.TypeKind.FLOAT64))
                and (args[0].source_field is None
                     or arg_types[0].is_decimal)
                and not args[0].is_literal
                and self.ctx.schema is not None):
            from ..registry.string_ops import cast_varchar_numeric_prepass
            return cast_varchar_numeric_prepass(self.ctx, node, args)
        from ..registry import decimal_ops
        decimal_ops.ensure_registered(arg_types)
        fn = self.registry.lookup_or_raise(node.name, arg_types)
        rt = fn.signature.return_type
        if rt is not None and rt != node.dtype:
            raise ExpressionValidationError(
                f"function {node.name} returns {rt}, "
                f"tree declares {node.dtype}")
        if fn.needs_return_type:
            out = fn.impl(self.ctx, args, return_type=node.dtype)
        else:
            out = fn.impl(self.ctx, args)
        if isinstance(out, Val):
            if (fn.nullability is Nullability.NULL_IF_NULL
                    and out.validity is None):
                # impls returning a bare-validity Val still obey the default
                # null-if-null rule (e.g. decimal kernels)
                out.validity = _and_validity([a.validity for a in args])
            return out
        if fn.nullability is Nullability.NULL_IF_NULL:
            validity = _and_validity([a.validity for a in args])
        else:
            validity = None
        return Val(out, validity, rt if rt is not None else node.dtype)

    def _if(self, node: IfNode) -> Val:
        cond = self.decompose(node.condition)
        then_v = self.decompose(node.then_node)
        else_v = self.decompose(node.else_node)
        if cond.dtype.kind is not dt.TypeKind.BOOL:
            raise ExpressionValidationError("if condition must be boolean")
        if then_v.dtype != else_v.dtype or then_v.dtype != node.dtype:
            raise ExpressionValidationError(
                f"if branches must both return {node.dtype}; got "
                f"{then_v.dtype} / {else_v.dtype}")
        sel = cond.value
        if cond.validity is not None:
            sel = jnp.logical_and(sel, cond.validity)
        if isinstance(then_v.value, tuple):  # decimal limb pairs
            value = tuple(jnp.where(sel, t, e)
                          for t, e in zip(then_v.value, else_v.value))
        else:
            value = jnp.where(sel, then_v.value, else_v.value)
        if then_v.validity is None and else_v.validity is None:
            validity = None
        else:
            cap = self.ctx.capacity
            validity = jnp.where(sel, _as_valid_mask(then_v, cap),
                                 _as_valid_mask(else_v, cap))
        return Val(value, validity, node.dtype)

    def _boolean(self, node: BooleanNode) -> Val:
        kids = [self.decompose(c) for c in node.children]
        for k in kids:
            if k.dtype.kind is not dt.TypeKind.BOOL:
                raise ExpressionValidationError(
                    f"{node.op} child must be boolean, got {k.dtype}")
        cap = self.ctx.capacity
        masks = [_as_valid_mask(k, cap) for k in kids]
        all_valid = reduce(jnp.logical_and, masks)
        if node.op == "and":
            # false AND anything = false (even null)
            any_false = reduce(jnp.logical_or,
                               [m & ~jnp.broadcast_to(k.value, (cap,))
                                for k, m in zip(kids, masks)])
            value = jnp.logical_not(any_false)
            validity = jnp.logical_or(any_false, all_valid)
        else:
            any_true = reduce(jnp.logical_or,
                              [m & jnp.broadcast_to(k.value, (cap,))
                               for k, m in zip(kids, masks)])
            value = any_true
            validity = jnp.logical_or(any_true, all_valid)
        if all(k.validity is None for k in kids):
            validity = None
        return Val(value, validity, dt.bool_)

    def _in(self, node: InNode) -> Val:
        ev = self.decompose(node.eval_expr)
        if ev.dtype != node.value_dtype:
            raise ExpressionValidationError(
                f"Evaluation expression for IN clause returns {ev.dtype} "
                f"values are of type {node.value_dtype}")
        if node.value_dtype.is_varlen:
            # membership decided per distinct dictionary value on host
            dict_thunk = ev.dict_thunk
            if dict_thunk is None:
                raise ExpressionValidationError(
                    "IN on string requires a dictionary-backed input")
            values = {v if isinstance(v, (str, bytes)) else str(v)
                      for v in node.values}

            def thunk(batch, _dt=dict_thunk, _vals=values):
                d = _dt(batch)
                member = np.array([x in _vals for x in _pylist(d)], dtype=bool)
                return _pad_pow2(member, False)

            table = self.ctx.add_table(thunk, cache_on_dicts=True)
            value = table[jnp.clip(ev.value, 0, table.shape[0] - 1)]
            return Val(value, ev.validity, dt.bool_)
        vals = np.array(sorted(node.values), dtype=node.value_dtype.np_dtype)
        value = jnp.isin(ev.value, jnp.asarray(vals))
        return Val(value, ev.validity, dt.bool_)


def _pylist(arrow_array):
    return [v.as_py() if hasattr(v, "as_py") else v for v in arrow_array]


def _pad_pow2(arr: np.ndarray, fill):
    n = max(1, len(arr))
    cap = 1 << (n - 1).bit_length()
    if cap == len(arr):
        return arr
    out = np.full(cap, fill, dtype=arr.dtype)
    out[:len(arr)] = arr
    return out
