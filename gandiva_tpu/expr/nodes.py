"""Expression tree IR.

Mirrors the reference's node taxonomy (gandiva/node.h, declared via
libgandiva.pxd:27-41): LiteralNode, FieldNode, FunctionNode, IfNode,
BooleanNode (and/or), InExpressionNode — plus Expression and Condition wrappers
(libgandiva.pxd:98-103). Pure data: no compute, no device code. Each node knows
its return DataType after validation; ``to_string`` reproduces the reference's
printing grammar (behavior pinned by pyarrow tests/test_gandiva.py:377-393,
e.g. ``'(const int64) 2'``, ``"if (...) { ... } else { ... }"``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, FrozenSet, Optional, Sequence, Tuple

from .. import dtypes as dt


class Node:
    """Base class for all expression nodes. Immutable and hashable."""

    dtype: dt.DataType

    def to_string(self) -> str:
        raise NotImplementedError

    def __str__(self) -> str:
        return self.to_string()

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.to_string()})"


@dataclasses.dataclass(frozen=True, repr=False)
class LiteralNode(Node):
    """A typed constant. Reference: TreeExprBuilder::MakeLiteral overloads
    (libgandiva.pxd:112-149) and MakeNull (libgandiva.pxd:150? — MakeNull is in
    tree_expr_builder.h). ``value is None`` encodes a typed NULL literal."""

    value: Any
    dtype: dt.DataType

    def to_string(self) -> str:
        # reference grammar: "(const int64) 2"; strings print with quotes;
        # floats print with "raw(...)" hex suffix in newer gandiva, but the
        # pyarrow-pinned tests only check int/string/bool forms.
        if self.value is None:
            return f"(const {self.dtype}) null"
        if self.dtype.kind is dt.TypeKind.STRING:
            return f"(const {self.dtype}) '{self.value}'"
        if self.dtype.kind is dt.TypeKind.FLOAT32 or self.dtype.kind is dt.TypeKind.FLOAT64:
            return f"(const {self.dtype}) {self.value}"
        if self.dtype.kind is dt.TypeKind.BOOL:
            return f"(const {self.dtype}) {1 if self.value else 0}"
        return f"(const {self.dtype}) {self.value}"


@dataclasses.dataclass(frozen=True, repr=False)
class FieldNode(Node):
    """A reference to an input column (gandiva FieldNode; MakeField
    libgandiva.pxd:151-153)."""

    field: dt.Field

    @property
    def dtype(self) -> dt.DataType:  # type: ignore[override]
        return self.field.dtype

    def to_string(self) -> str:
        return f"({self.dtype}) {self.field.name}"


@dataclasses.dataclass(frozen=True, repr=False)
class FunctionNode(Node):
    """A registry-function call (gandiva FunctionNode; MakeFunction
    libgandiva.pxd:155-158). ``dtype`` is the declared return type."""

    name: str
    args: Tuple[Node, ...]
    dtype: dt.DataType

    def to_string(self) -> str:
        inner = ", ".join(a.to_string() for a in self.args)
        return f"{self.dtype} {self.name}({inner})"


@dataclasses.dataclass(frozen=True, repr=False)
class IfNode(Node):
    """if/then/else (gandiva IfNode; MakeIf libgandiva.pxd:163-166). Nested
    if-chains encode SQL CASE."""

    condition: Node
    then_node: Node
    else_node: Node
    dtype: dt.DataType

    def to_string(self) -> str:
        return (f"if ({self.condition.to_string()}) {{ "
                f"{self.then_node.to_string()} }} else {{ "
                f"{self.else_node.to_string()} }}")


@dataclasses.dataclass(frozen=True, repr=False)
class BooleanNode(Node):
    """N-ary AND/OR with Kleene short-circuit null semantics (gandiva
    BooleanNode; MakeAnd/MakeOr libgandiva.pxd:168-172)."""

    op: str  # "and" | "or"
    children: Tuple[Node, ...]

    dtype = dt.bool_

    def to_string(self) -> str:
        sep = " && " if self.op == "and" else " || "
        return sep.join(c.to_string() for c in self.children)


@dataclasses.dataclass(frozen=True, repr=False)
class InNode(Node):
    """Typed IN-set membership (gandiva InExpressionNode<T>; the 10 typed
    builders at libgandiva.pxd:178-212). ``values`` is a frozenset of python
    scalars; ``value_dtype`` is the element type the eval subtree must have."""

    eval_expr: Node
    values: FrozenSet[Any]
    value_dtype: dt.DataType

    dtype = dt.bool_

    def to_string(self) -> str:
        vals = ", ".join(repr(v) if isinstance(v, str) else str(v)
                         for v in sorted(self.values, key=lambda x: (str(type(x)), x)))
        return f"{self.eval_expr.to_string()} IN ({vals})"


@dataclasses.dataclass(frozen=True, repr=False)
class Expression:
    """A root node bound to a named, typed output field (gandiva Expression;
    MakeExpression libgandiva.pxd:159-161)."""

    root: Node
    result_field: dt.Field

    def to_string(self) -> str:
        return self.root.to_string()

    def __str__(self):
        return self.to_string()


@dataclasses.dataclass(frozen=True, repr=False)
class Condition:
    """A boolean root node for Filter (gandiva Condition; MakeCondition
    libgandiva.pxd:174-176)."""

    root: Node

    def to_string(self) -> str:
        return self.root.to_string()

    def __str__(self):
        return self.to_string()
