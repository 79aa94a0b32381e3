"""Acceptance tests for the expression engine, ported behaviorally from the
reference's pyarrow suite (pyarrow tests/test_gandiva.py — build tree →
compile → evaluate small literal batches → compare exact outputs). These are
oracle-free: expected values are literal in the test.
"""
import numpy as np
import pyarrow as pa
import pytest

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt

B = g.TreeExprBuilder


def test_tree_exp_builder_if_else():
    # mirrors test_gandiva.py:25-63: if (a > b) a else b
    fa = dt.Field("a", dt.int32)
    fb = dt.Field("b", dt.int32)
    schema = dt.Schema([fa, fb])

    na = B.make_field(fa)
    nb = B.make_field(fb)
    cond = B.make_function("greater_than", [na, nb], dt.bool_)
    if_node = B.make_if(cond, na, nb, dt.int32)
    expr = B.make_expression(if_node, dt.Field("result", dt.int32))

    proj = g.make_projector(schema, [expr])

    a = pa.array([10, 12, -20, 5], type=pa.int32())
    b = pa.array([5, 15, 15, 17], type=pa.int32())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])

    (r,) = proj.evaluate(batch)
    assert r.equals(pa.array([10, 15, 15, 17], type=pa.int32()))
    # DumpIR analogue: the lowered plan text is exposed
    hlo = proj.dump_hlo(g.from_arrow(batch))
    assert len(hlo) > 0


def test_projector_arithmetic_with_nulls():
    fa = dt.Field("a", dt.int64)
    fb = dt.Field("b", dt.float64)
    schema = dt.Schema([fa, fb])

    na, nb = B.make_field(fa), B.make_field(fb)
    two = B.make_double_literal(2.0)
    # b * 2 + castFLOAT8(a)
    acast = B.make_function("castFLOAT8", [na], dt.float64)
    mul = B.make_function("multiply", [nb, two], dt.float64)
    add = B.make_function("add", [mul, acast], dt.float64)
    expr = B.make_expression(add, dt.Field("out", dt.float64))

    proj = g.make_projector(schema, [expr])
    a = pa.array([1, None, 3, 4], type=pa.int64())
    b = pa.array([0.5, 1.5, None, 2.0], type=pa.float64())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    (r,) = proj.evaluate(batch)
    assert r.equals(pa.array([2.0, None, None, 8.0], type=pa.float64()))


def test_filter():
    # mirrors test_gandiva.py:94-114: filter a < 1000 over 0..9999
    fa = dt.Field("a", dt.float64)
    schema = dt.Schema([fa])
    cond = B.make_condition(
        B.make_function("less_than",
                        [B.make_field(fa), B.make_double_literal(1000.0)],
                        dt.bool_))
    filt = g.make_filter(schema, cond)

    a = pa.array(np.arange(10000, dtype=np.float64))
    batch = pa.RecordBatch.from_arrays([a], names=["a"])
    sel = filt.evaluate(batch)
    assert len(sel) == 1000
    np.testing.assert_array_equal(sel.to_numpy(), np.arange(1000))
    arr = sel.to_array()
    assert arr.type == pa.uint32()


def test_filter_project_composition_with_nulls():
    # mirrors test_gandiva.py:330-373 — the most load-bearing semantics test:
    # filter (a > b), then project c_or_minus(a, b, c) over selected rows,
    # with nulls in c propagating to the output.
    fa = dt.Field("a", dt.int32)
    fb = dt.Field("b", dt.int32)
    fc = dt.Field("c", dt.int32)
    schema = dt.Schema([fa, fb, fc])

    na, nb, nc = B.make_field(fa), B.make_field(fb), B.make_field(fc)
    cond = B.make_condition(B.make_function("greater_than", [na, nb], dt.bool_))
    filt = g.make_filter(schema, cond)

    sum_ab = B.make_function("add", [na, nb], dt.int32)
    out = B.make_function("add", [sum_ab, nc], dt.int32)
    expr = B.make_expression(out, dt.Field("result", dt.int32))
    proj = g.make_projector(schema, [expr], g.SelectionMode.UINT32)

    a = pa.array([10, 12, -20, 5, 21], type=pa.int32())
    b = pa.array([5, 15, 15, 17, 20], type=pa.int32())
    c = pa.array([1, None, 3, None, 7], type=pa.int32())
    batch = pa.RecordBatch.from_arrays([a, b, c], names=["a", "b", "c"])

    sel = filt.evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [0, 4])

    (r,) = proj.evaluate(g.from_arrow(batch), selection=sel)
    assert r.equals(pa.array([16, 48], type=pa.int32()))


def test_boolean_and_or():
    # mirrors test_gandiva.py:229-252
    fa = dt.Field("a", dt.int64)
    fb = dt.Field("b", dt.int64)
    schema = dt.Schema([fa, fb])
    na, nb = B.make_field(fa), B.make_field(fb)
    fifty = B.make_int64_literal(50)
    hundred = B.make_int64_literal(100)
    cond = B.make_condition(B.make_and([
        B.make_function("greater_than", [na, fifty], dt.bool_),
        B.make_function("less_than", [nb, hundred], dt.bool_),
    ]))
    filt = g.make_filter(schema, cond)
    a = pa.array([40, 60, 70, 80], type=pa.int64())
    b = pa.array([50, 200, 70, 80], type=pa.int64())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    sel = filt.evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [2, 3])


def test_kleene_null_semantics():
    # false AND null = false; true AND null = null; true OR null = true
    fa = dt.Field("a", dt.bool_)
    fb = dt.Field("b", dt.bool_)
    schema = dt.Schema([fa, fb])
    na, nb = B.make_field(fa), B.make_field(fb)

    and_expr = B.make_expression(B.make_and([na, nb]),
                                 dt.Field("r", dt.bool_))
    or_expr = B.make_expression(B.make_or([na, nb]),
                                dt.Field("r", dt.bool_))

    a = pa.array([False, True, None, True], type=pa.bool_())
    b = pa.array([None, None, None, True], type=pa.bool_())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])

    (r_and,) = g.make_projector(schema, [and_expr]).evaluate(batch)
    assert r_and.equals(pa.array([False, None, None, True], type=pa.bool_()))

    (r_or,) = g.make_projector(schema, [or_expr]).evaluate(batch)
    assert r_or.equals(pa.array([None, True, None, True], type=pa.bool_()))


def test_in_expr_int():
    # mirrors test_gandiva.py:118-151 (int32/int64 paths)
    fa = dt.Field("a", dt.int32)
    schema = dt.Schema([fa])
    node = B.make_in_expression_int32(B.make_field(fa), [1, 2, 3])
    filt = g.make_filter(schema, B.make_condition(node))
    a = pa.array([0, 1, 2, 3, 4, 5], type=pa.int32())
    batch = pa.RecordBatch.from_arrays([a], names=["a"])
    sel = filt.evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [1, 2, 3])


def test_literals():
    # mirrors test_gandiva.py:256-292: literal building + TypeError cases
    B.make_boolean_literal(True)
    B.make_int8_literal(1)
    B.make_uint64_literal(2 ** 63)
    B.make_double_literal(1.5)
    B.make_string_literal("hello")
    B.make_binary_literal(b"bytes")

    with pytest.raises(TypeError):
        B.make_boolean_literal("string")
    with pytest.raises(TypeError):
        B.make_int32_literal(1.5)
    with pytest.raises(TypeError):
        B.make_string_literal(b"bytes")
    with pytest.raises(TypeError):
        B.make_binary_literal("string")


def test_to_string():
    # mirrors test_gandiva.py:377-393: expression printing grammar
    assert B.make_int64_literal(2).to_string() == "(const int64) 2"
    f = dt.Field("x", dt.float64)
    assert B.make_field(f).to_string() == "(float64) x"
    fn = B.make_function("add", [B.make_field(f), B.make_double_literal(1.0)],
                         dt.float64)
    assert fn.to_string() == \
        "float64 add((float64) x, (const float64) 1.0)"
    z = dt.Field("z", dt.bool_)
    y = dt.Field("y", dt.bool_)
    notz = B.make_function("not", [B.make_field(z)], dt.bool_)
    andexpr = B.make_and([notz, B.make_field(y)])
    assert andexpr.to_string() == "bool not((bool) z) && (bool) y"


def test_rejects_none():
    # mirrors test_gandiva.py:397-434
    fa = dt.Field("a", dt.int32)
    with pytest.raises(TypeError):
        B.make_field(None)
    with pytest.raises(TypeError):
        B.make_function(None, [B.make_field(fa)], dt.int32)
    with pytest.raises(TypeError):
        B.make_function("add", None, dt.int32)
    with pytest.raises(TypeError):
        B.make_if(None, B.make_field(fa), B.make_field(fa), dt.int32)
    with pytest.raises(TypeError):
        B.make_and(None)
    with pytest.raises(TypeError):
        B.make_condition(None)
    with pytest.raises(TypeError):
        B.make_expression(None, fa)
    with pytest.raises(TypeError):
        B.make_in_expression_int32(B.make_field(fa), None)


def test_validation_errors():
    fa = dt.Field("a", dt.int32)
    schema = dt.Schema([fa])
    # unknown field
    fb = dt.Field("missing", dt.int32)
    expr = B.make_expression(B.make_field(fb), dt.Field("r", dt.int32))
    with pytest.raises(g.ExpressionValidationError):
        g.make_projector(schema, [expr], use_cache=False)
    # unknown function signature
    bad = B.make_expression(
        B.make_function("no_such_fn", [B.make_field(fa)], dt.int32),
        dt.Field("r", dt.int32))
    with pytest.raises(g.ExpressionValidationError):
        g.make_projector(schema, [bad], use_cache=False)
    # IN type mismatch
    innode = B.make_in_expression_int64(B.make_field(fa), [1, 2])
    with pytest.raises(g.ExpressionValidationError):
        g.make_filter(schema, B.make_condition(innode), use_cache=False)


def test_registry_introspection():
    # mirrors test_gandiva.py:319-326
    sigs = g.get_registered_function_signatures()
    assert len(sigs) > 100
    s = {(x.name, x.param_types, x.return_type) for x in sigs}
    assert ("add", (dt.int32, dt.int32), dt.int32) in s
    assert ("greater_than", (dt.float64, dt.float64), dt.bool_) in s
    names = {x.name for x in sigs}
    assert {"add", "subtract", "multiply", "divide", "mod", "equal",
            "less_than", "isnull", "sqrt", "round"} <= names


def test_evaluate_many_batches_reuses_compile():
    fa = dt.Field("a", dt.int64)
    schema = dt.Schema([fa])
    expr = B.make_expression(
        B.make_function("multiply",
                        [B.make_field(fa), B.make_int64_literal(3)],
                        dt.int64),
        dt.Field("r", dt.int64))
    proj = g.make_projector(schema, [expr], use_cache=False)
    for i in range(3):
        a = pa.array(np.arange(100) + i, type=pa.int64())
        batch = pa.RecordBatch.from_arrays([a], names=["a"])
        (r,) = proj.evaluate(batch)
        np.testing.assert_array_equal(np.asarray(r), (np.arange(100) + i) * 3)


def test_in_expr_extended_types():
    """Coverage the reference explicitly lacks (test_gandiva.py:154-155
    skips: 'Gandiva C++ did not have *real* binary, time and date
    support') — this engine supports typed IN for binary/date/timestamp."""
    # binary IN
    fb = dt.Field("b", dt.binary)
    schema = dt.Schema([fb])
    node = B.make_in_expression_binary(B.make_field(fb), [b"ab", b"zz"])
    batch = pa.RecordBatch.from_arrays(
        [pa.array([b"ab", b"cd", b"zz", None], type=pa.binary())],
        names=["b"])
    sel = g.make_filter(schema, B.make_condition(node),
                        use_cache=False).evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [0, 2])

    # date32 IN (days since epoch)
    fd = dt.Field("d", dt.date32)
    schema_d = dt.Schema([fd])
    node = B.make_in_expression_date32(B.make_field(fd), [18262, 18263])
    batch = pa.RecordBatch.from_arrays(
        [pa.array([18261, 18262, 18263, 18264], type=pa.int32()).cast(
            pa.date32())], names=["d"])
    sel = g.make_filter(schema_d, B.make_condition(node),
                        use_cache=False).evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [1, 2])

    # timestamp IN (millis)
    ft = dt.Field("t", dt.timestamp)
    schema_t = dt.Schema([ft])
    node = B.make_in_expression_timestamp(B.make_field(ft),
                                          [86400000, 172800000])
    batch = pa.RecordBatch.from_arrays(
        [pa.array([0, 86400000, 172800000], type=pa.int64()).cast(
            pa.timestamp("ms"))], names=["t"])
    sel = g.make_filter(schema_t, B.make_condition(node),
                        use_cache=False).evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [1, 2])


def test_configuration_optimize_flag():
    """Configuration.optimize=False evaluates eagerly (no XLA optimization
    pipeline) with identical results — reference semantics: optimize=False
    skips the LLVM opt passes but stays correct (gandiva.pyx:591-608)."""
    fa = dt.Field("a", dt.int32)
    schema = dt.Schema([fa])
    na = B.make_field(fa)
    two = B.make_literal(2, dt.int32)
    expr = B.make_expression(B.make_function("multiply", [na, two], dt.int32),
                             dt.Field("r", dt.int32))

    cfg_off = g.ConfigurationBuilder().with_optimize(False).build()
    p_opt = g.make_projector(schema, [expr])
    p_raw = g.make_projector(schema, [expr], config=cfg_off)
    assert p_raw._jit is not p_raw._jit_lower     # eager path installed
    assert p_opt._jit is p_opt._jit_lower         # jitted path installed

    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, None, 3], type=pa.int32())], names=["a"])
    (r1,) = p_opt.evaluate(batch)
    (r2,) = p_raw.evaluate(batch)
    assert r1.equals(r2)
    assert r1.equals(pa.array([2, None, 6], type=pa.int32()))


def test_selection_mode_enforced():
    """Reference contract: a Projector compiled without a SelectionMode
    rejects selection-vector evaluation; modes must match
    (libgandiva.pxd:238, test_gandiva.py:358-373)."""
    fa = dt.Field("a", dt.int32)
    schema = dt.Schema([fa])
    na = B.make_field(fa)
    expr = B.make_expression(na, dt.Field("r", dt.int32))
    cond = g.TreeExprBuilder.make_condition(
        B.make_function("greater_than", [na, B.make_literal(1, dt.int32)],
                        dt.bool_))
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, 3], type=pa.int32())], names=["a"])

    sel16 = g.make_filter(schema, cond).evaluate(batch, g.SelectionMode.UINT16)
    p_none = g.make_projector(schema, [expr])
    with pytest.raises(ValueError, match="selection_mode=NONE"):
        p_none.evaluate(batch, selection=sel16)

    p32 = g.make_projector(schema, [expr], g.SelectionMode.UINT32)
    with pytest.raises(ValueError, match="does not match"):
        p32.evaluate(batch, selection=sel16)

    p16 = g.make_projector(schema, [expr], g.SelectionMode.UINT16)
    (r,) = p16.evaluate(batch, selection=sel16)
    assert r.equals(pa.array([2, 3], type=pa.int32()))


def test_profile_and_cost_analysis(tmp_path):
    """plan.profile writes a jax.profiler trace dir; cost_analysis returns
    XLA's compiled cost estimate (VERDICT r3 #10)."""
    import os
    schema = dt.Schema([dt.Field("a", dt.int64)])
    expr = B.make_expression(
        B.make_function("add", [B.make_field(schema.field("a")),
                                B.make_int64_literal(1)], dt.int64),
        dt.Field("out", dt.int64))
    proj = g.make_projector(schema, [expr], use_cache=False)
    from gandiva_tpu.batch import from_arrow
    batch = from_arrow(pa.RecordBatch.from_arrays(
        [pa.array(np.arange(1000))], names=["a"]))
    d = proj.profile(batch, trace_dir=str(tmp_path))
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found, "profiler trace directory must not be empty"
    ca = proj.cost_analysis(batch)
    assert ca is not None and len(ca) > 0
