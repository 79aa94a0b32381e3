"""Property tests: random expression trees vs an independent numpy
interpreter implementing the reference null rules (SURVEY.md §4.4 — the
decomposer's null semantics as explicit invariants, not just examples).

The interpreter is deliberately written from the RULES (null-if-null
default, Kleene and/or, if-condition-null takes else, isnull never-null),
not from the engine code, so agreement is evidence both match the spec.
"""
import numpy as np
import pyarrow as pa
import pytest

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.expr.nodes import (BooleanNode, FieldNode, FunctionNode,
                                    IfNode, LiteralNode)

B = g.TreeExprBuilder

FIELDS = [dt.Field("x", dt.int64), dt.Field("y", dt.int64),
          dt.Field("p", dt.bool_), dt.Field("q", dt.bool_)]
SCHEMA = dt.Schema(FIELDS)


def interp(node, env):
    """→ (value ndarray, valid ndarray) with reference null rules."""
    if isinstance(node, LiteralNode):
        n = len(next(iter(env.values()))[0])
        if node.value is None:
            z = np.zeros(n, dtype=np.int64 if node.dtype == dt.int64
                         else bool)
            return z, np.zeros(n, dtype=bool)
        v = np.full(n, node.value,
                    dtype=np.int64 if node.dtype == dt.int64 else bool)
        return v, np.ones(n, dtype=bool)
    if isinstance(node, FieldNode):
        return env[node.field.name]
    if isinstance(node, FunctionNode):
        args = [interp(a, env) for a in node.args]
        if node.name == "isnull":
            return ~args[0][1], np.ones_like(args[0][1])
        if node.name == "isnotnull":
            return args[0][1].copy(), np.ones_like(args[0][1])
        valid = np.ones_like(args[0][1])
        for _, av in args:
            valid = valid & av
        vals = [a[0] for a in args]
        if node.name == "add":
            return vals[0] + vals[1], valid
        if node.name == "subtract":
            return vals[0] - vals[1], valid
        if node.name == "multiply":
            return vals[0] * vals[1], valid
        if node.name == "greater_than":
            return vals[0] > vals[1], valid
        if node.name == "less_than":
            return vals[0] < vals[1], valid
        if node.name == "equal":
            return vals[0] == vals[1], valid
        if node.name == "not":
            return ~vals[0], valid
        raise AssertionError(node.name)
    if isinstance(node, IfNode):
        cv, cva = interp(node.condition, env)
        tv, tva = interp(node.then_node, env)
        ev, eva = interp(node.else_node, env)
        sel = cv & cva           # null condition takes the else branch
        return np.where(sel, tv, ev), np.where(sel, tva, eva)
    if isinstance(node, BooleanNode):
        kids = [interp(c, env) for c in node.children]
        if node.op == "and":
            any_false = np.zeros_like(kids[0][1])
            all_valid = np.ones_like(kids[0][1])
            for v, va in kids:
                any_false |= va & ~v
                all_valid &= va
            return ~any_false, any_false | all_valid
        any_true = np.zeros_like(kids[0][1])
        all_valid = np.ones_like(kids[0][1])
        for v, va in kids:
            any_true |= va & v
            all_valid &= va
        return any_true, any_true | all_valid
    raise AssertionError(type(node))


def random_tree(rng, depth, want):
    """want ∈ {'int', 'bool'}."""
    if depth == 0 or rng.random() < 0.25:
        if want == "int":
            r = rng.random()
            if r < 0.4:
                return B.make_field(FIELDS[rng.integers(0, 2)])
            if r < 0.5:
                return B.make_null(dt.int64)
            return B.make_int64_literal(int(rng.integers(-50, 50)))
        r = rng.random()
        if r < 0.5:
            return B.make_field(FIELDS[2 + rng.integers(0, 2)])
        if r < 0.6:
            return B.make_null(dt.bool_)
        return B.make_boolean_literal(bool(rng.integers(0, 2)))
    if want == "int":
        r = rng.random()
        if r < 0.6:
            op = ["add", "subtract", "multiply"][rng.integers(0, 3)]
            return B.make_function(op, [random_tree(rng, depth - 1, "int"),
                                        random_tree(rng, depth - 1, "int")],
                                   dt.int64)
        return B.make_if(random_tree(rng, depth - 1, "bool"),
                         random_tree(rng, depth - 1, "int"),
                         random_tree(rng, depth - 1, "int"), dt.int64)
    r = rng.random()
    if r < 0.3:
        op = ["greater_than", "less_than", "equal"][rng.integers(0, 3)]
        return B.make_function(op, [random_tree(rng, depth - 1, "int"),
                                    random_tree(rng, depth - 1, "int")],
                               dt.bool_)
    if r < 0.5:
        maker = B.make_and if rng.random() < 0.5 else B.make_or
        return maker([random_tree(rng, depth - 1, "bool"),
                      random_tree(rng, depth - 1, "bool")])
    if r < 0.6:
        return B.make_function("not", [random_tree(rng, depth - 1, "bool")],
                               dt.bool_)
    if r < 0.7:
        return B.make_function("isnull",
                               [random_tree(rng, depth - 1, "int")],
                               dt.bool_)
    return B.make_if(random_tree(rng, depth - 1, "bool"),
                     random_tree(rng, depth - 1, "bool"),
                     random_tree(rng, depth - 1, "bool"), dt.bool_)


@pytest.mark.parametrize("seed", range(12))
def test_random_trees_match_interpreter(seed):
    rng = np.random.default_rng(seed)
    n = 300
    x = rng.integers(-100, 100, n)
    y = rng.integers(-100, 100, n)
    p = rng.random(n) < 0.5
    q = rng.random(n) < 0.5
    nx = rng.random(n) < 0.25
    ny = rng.random(n) < 0.25
    np_ = rng.random(n) < 0.25
    nq = rng.random(n) < 0.25

    env = {"x": (x, ~nx), "y": (y, ~ny), "p": (p, ~np_), "q": (q, ~nq)}
    batch = pa.RecordBatch.from_arrays(
        [pa.array(x, mask=nx), pa.array(y, mask=ny),
         pa.array(p, mask=np_), pa.array(q, mask=nq)],
        names=["x", "y", "p", "q"])

    for want, out_t in (("int", dt.int64), ("bool", dt.bool_)):
        for _ in range(4):
            tree = random_tree(rng, 4, want)
            expr = B.make_expression(tree, dt.Field("r", out_t))
            proj = g.make_projector(SCHEMA, [expr], use_cache=False)
            (got,) = proj.evaluate(batch)
            ev, eva = interp(tree, env)
            expected = pa.array(ev, mask=~eva,
                                type=pa.int64() if want == "int"
                                else pa.bool_())
            assert got.equals(expected), tree.to_string()
