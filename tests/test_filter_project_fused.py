"""FilterProject fused plan must be bit-identical to Filter + Projector."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt

B = g.TreeExprBuilder


def test_fused_equals_unfused():
    schema = dt.Schema([dt.Field("a", dt.int64), dt.Field("b", dt.float64)])
    na, nb = B.make_field(schema.field("a")), B.make_field(schema.field("b"))
    cond = B.make_condition(
        B.make_function("greater_than", [na, B.make_int64_literal(500)],
                        dt.bool_))
    expr = B.make_expression(
        B.make_function(
            "add",
            [B.make_function("multiply", [nb, B.make_double_literal(2.0)],
                             dt.float64),
             B.make_function("castFLOAT8", [na], dt.float64)], dt.float64),
        dt.Field("out", dt.float64))

    rng = np.random.default_rng(0)
    n = 5000
    a = rng.integers(0, 1000, n)
    bvals = rng.random(n)
    nulls = rng.random(n) < 0.1
    batch = pa.RecordBatch.from_arrays(
        [pa.array(a, mask=nulls), pa.array(bvals)], names=["a", "b"])
    dev = g.from_arrow(batch)

    sel1 = g.make_filter(schema, cond).evaluate(dev)
    (out1,) = g.make_projector(schema, [expr], g.SelectionMode.UINT32) \
        .evaluate(dev, selection=sel1)

    fp = g.make_filter_project(schema, cond, [expr])
    sel2, (out2,) = fp.evaluate(dev)

    np.testing.assert_array_equal(sel1.to_numpy(), sel2.to_numpy())
    assert out1.equals(out2)

    # and against the arrow oracle
    mask = pc.fill_null(pc.greater(batch.column("a"), pa.scalar(500)), False)
    exp_idx = np.nonzero(np.asarray(mask))[0]
    expected = pc.take(
        pc.add(pc.multiply(batch.column("b"), pa.scalar(2.0)),
               pc.cast(batch.column("a"), pa.float64())), pa.array(exp_idx))
    assert out2.equals(expected)


def test_fused_with_strings():
    schema = dt.Schema([dt.Field("s", dt.string), dt.Field("x", dt.int64)])
    ns, nx = B.make_field(schema.field("s")), B.make_field(schema.field("x"))
    cond = B.make_condition(
        B.make_function("starts_with", [ns, B.make_string_literal("a")],
                        dt.bool_))
    exprs = [
        B.make_expression(B.make_function("upper", [ns], dt.string),
                          dt.Field("u", dt.string)),
        B.make_expression(
            B.make_function("multiply", [nx, B.make_int64_literal(10)],
                            dt.int64), dt.Field("x10", dt.int64)),
    ]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(["ax", "bx", "ay", None]),
         pa.array([1, 2, 3, 4], type=pa.int64())], names=["s", "x"])
    fp = g.make_filter_project(schema, cond, exprs)
    sel, (u, x10) = fp.evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [0, 2])
    assert u.to_pylist() == ["AX", "AY"]
    assert x10.to_pylist() == [10, 30]
