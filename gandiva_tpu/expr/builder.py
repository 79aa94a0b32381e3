"""TreeExprBuilder — the factory surface for expression trees.

Mirrors the reference builder exactly (gandiva/tree_expr_builder.h, declared at
libgandiva.pxd:110-212; python mirror gandiva.pyx:283-589): 13 typed literal
constructors, make_field / make_function / make_if / make_and / make_or /
make_expression / make_condition, and the 10 typed IN builders.

Argument validation behavior is pinned by pyarrow tests/test_gandiva.py:397-434
(test_rejects_none): passing None where a node/field/name is required raises
TypeError at build time, not at compile time.
"""
from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence

from .. import dtypes as dt
from .nodes import (BooleanNode, Condition, Expression, FieldNode,
                    FunctionNode, IfNode, InNode, LiteralNode, Node)


def _require(cond: bool, msg: str):
    if not cond:
        raise TypeError(msg)


def _require_node(x, what="node"):
    _require(isinstance(x, Node), f"{what} must be a Node, got {type(x).__name__}")
    return x


def _require_nodes(xs, what="children"):
    _require(xs is not None and not isinstance(xs, (str, bytes)),
             f"{what} must be a sequence of Nodes")
    xs = tuple(xs)
    for x in xs:
        _require_node(x, what)
    return xs


class TreeExprBuilder:
    """Stateless factory; every method is usable as a classmethod."""

    # -- literals (libgandiva.pxd:112-149) --------------------------------
    @staticmethod
    def make_literal(value, dtype: dt.DataType) -> LiteralNode:
        _require(isinstance(dtype, dt.DataType),
                 f"dtype must be a DataType, got {type(dtype).__name__}")
        if value is not None:
            if dtype.kind is dt.TypeKind.BOOL:
                _require(isinstance(value, (bool,)) or value in (0, 1),
                         "bool literal requires a bool")
                value = bool(value)
            elif dtype.is_integer or dtype.is_temporal:
                _require(isinstance(value, int) and not isinstance(value, bool),
                         f"{dtype} literal requires an int, got {type(value).__name__}")
            elif dtype.is_float:
                _require(isinstance(value, (int, float)) and not isinstance(value, bool),
                         f"{dtype} literal requires a float")
                value = float(value)
            elif dtype.kind is dt.TypeKind.STRING:
                _require(isinstance(value, str), "string literal requires str")
            elif dtype.kind is dt.TypeKind.BINARY:
                _require(isinstance(value, (bytes, bytearray)),
                         "binary literal requires bytes")
                value = bytes(value)
        return LiteralNode(value, dtype)

    @staticmethod
    def make_boolean_literal(v: bool) -> LiteralNode:
        _require(isinstance(v, bool), "expected bool")
        return LiteralNode(v, dt.bool_)

    @staticmethod
    def make_int8_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.int8)

    @staticmethod
    def make_int16_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.int16)

    @staticmethod
    def make_int32_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.int32)

    @staticmethod
    def make_int64_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.int64)

    @staticmethod
    def make_uint8_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.uint8)

    @staticmethod
    def make_uint16_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.uint16)

    @staticmethod
    def make_uint32_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.uint32)

    @staticmethod
    def make_uint64_literal(v: int) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.uint64)

    @staticmethod
    def make_float_literal(v: float) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.float32)

    @staticmethod
    def make_double_literal(v: float) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.float64)

    @staticmethod
    def make_string_literal(v: str) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.string)

    @staticmethod
    def make_binary_literal(v: bytes) -> LiteralNode:
        return TreeExprBuilder.make_literal(v, dt.binary)

    @staticmethod
    def make_decimal_literal(value, precision: int, scale: int) -> LiteralNode:
        """Decimal literal; ``value`` is a str/Decimal/int interpreted at the
        given scale (mirrors gandiva's DecimalScalar128 literal)."""
        import decimal as _d

        # widen the context: the default prec=28 silently rounds decimal128
        # literals with >28 significant digits during the scale shift
        # (ADVICE r3 — plan.py round-trip of full-precision literals)
        with _d.localcontext() as ctx:
            ctx.prec = 80
            d = _d.Decimal(str(value))
            unscaled = int(d.scaleb(scale).to_integral_value(
                rounding=_d.ROUND_HALF_UP))
        return LiteralNode(unscaled, dt.decimal128(precision, scale))

    @staticmethod
    def make_interval_day_literal(days: int, millis: int = 0) -> LiteralNode:
        """Interval-day literal (gandiva IntervalDayScalar: days + millis,
        packed (days << 32) | millis in the int64 lane — dtypes.py)."""
        import numbers
        _require(isinstance(days, numbers.Integral)
                 and isinstance(millis, numbers.Integral),
                 "interval_day literal requires ints (days, millis)")
        _require(0 <= millis < 86_400_000,
                 "interval_day millis must be in [0, 86400000)")
        return LiteralNode((int(days) << 32) | int(millis), dt.interval_day)

    @staticmethod
    def make_interval_year_literal(months: int) -> LiteralNode:
        """Interval-year literal (months, int32 lane)."""
        import numbers
        _require(isinstance(months, numbers.Integral),
                 "interval_year literal requires an int month count")
        return LiteralNode(int(months), dt.interval_year)

    @staticmethod
    def make_null(dtype: dt.DataType) -> LiteralNode:
        _require(isinstance(dtype, dt.DataType), "expected DataType")
        return LiteralNode(None, dtype)

    # -- field / function / control (libgandiva.pxd:151-176) --------------
    @staticmethod
    def make_field(field: dt.Field) -> FieldNode:
        _require(isinstance(field, dt.Field),
                 f"field must be a Field, got {type(field).__name__}")
        return FieldNode(field)

    @staticmethod
    def make_function(name: str, params: Sequence[Node],
                      return_type: dt.DataType) -> FunctionNode:
        _require(isinstance(name, str), "function name must be str")
        params = _require_nodes(params, "params")
        _require(isinstance(return_type, dt.DataType),
                 "return_type must be a DataType")
        return FunctionNode(name, params, return_type)

    @staticmethod
    def make_if(condition: Node, then_node: Node, else_node: Node,
                return_type: dt.DataType) -> IfNode:
        _require_node(condition, "condition")
        _require_node(then_node, "then_node")
        _require_node(else_node, "else_node")
        _require(isinstance(return_type, dt.DataType),
                 "return_type must be a DataType")
        return IfNode(condition, then_node, else_node, return_type)

    @staticmethod
    def make_and(children: Sequence[Node]) -> BooleanNode:
        return BooleanNode("and", _require_nodes(children))

    @staticmethod
    def make_or(children: Sequence[Node]) -> BooleanNode:
        return BooleanNode("or", _require_nodes(children))

    @staticmethod
    def make_expression(root: Node, result_field: dt.Field) -> Expression:
        _require_node(root, "root")
        _require(isinstance(result_field, dt.Field),
                 "result_field must be a Field")
        return Expression(root, result_field)

    @staticmethod
    def make_condition(root: Node) -> Condition:
        _require_node(root, "condition root")
        return Condition(root)

    # -- typed IN builders (libgandiva.pxd:178-212) ------------------------
    @staticmethod
    def _make_in(expr: Node, values: Iterable, dtype: dt.DataType) -> InNode:
        _require_node(expr, "expression")
        _require(values is not None and not isinstance(values, (str, bytes)),
                 "values must be an iterable of scalars")
        return InNode(expr, frozenset(values), dtype)

    @staticmethod
    def make_in_expression_int32(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.int32)

    @staticmethod
    def make_in_expression_int64(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.int64)

    @staticmethod
    def make_in_expression_time32(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.time32)

    @staticmethod
    def make_in_expression_time64(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.time64)

    @staticmethod
    def make_in_expression_date32(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.date32)

    @staticmethod
    def make_in_expression_date64(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.date64)

    @staticmethod
    def make_in_expression_timestamp(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.timestamp)

    @staticmethod
    def make_in_expression_string(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.string)

    @staticmethod
    def make_in_expression_binary(expr, values):
        return TreeExprBuilder._make_in(expr, values, dt.binary)

    @staticmethod
    def make_in_expression(expr, values, dtype: dt.DataType):
        """Generic dispatcher mirroring pyarrow's single entry point."""
        return TreeExprBuilder._make_in(expr, values, dtype)
