"""Differential tests: random typed/nullable batches through both engines.

pyarrow.compute / acero is the locally-runnable behavioral oracle (SURVEY.md
Tier D): generate random batches, run the same logical expression in both
engines, require row-for-row equality (BASELINE.json north_star).
"""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt

B = g.TreeExprBuilder


def _random_batch(rng, n, null_prob=0.15):
    def nullify(arr):
        mask = rng.random(n) < null_prob
        return pa.array(arr, mask=mask)

    a = nullify(rng.integers(-1000, 1000, size=n).astype(np.int64))
    b = nullify(rng.random(n) * 200 - 100)
    c = nullify(rng.integers(0, 100, size=n).astype(np.int32))
    return pa.RecordBatch.from_arrays([a, b, c], names=["a", "b", "c"])


SCHEMA = dt.Schema([
    dt.Field("a", dt.int64),
    dt.Field("b", dt.float64),
    dt.Field("c", dt.int32),
])


@pytest.mark.parametrize("n", [17, 1000])
def test_arith_differential(n):
    rng = np.random.default_rng(42)
    batch = _random_batch(rng, n)

    na, nb = B.make_field(SCHEMA.field("a")), B.make_field(SCHEMA.field("b"))
    acast = B.make_function("castFLOAT8", [na], dt.float64)
    mul = B.make_function("multiply", [nb, B.make_double_literal(2.0)],
                          dt.float64)
    add = B.make_function("add", [mul, acast], dt.float64)
    proj = g.make_projector(SCHEMA, [B.make_expression(add, dt.Field("r", dt.float64))])
    (ours,) = proj.evaluate(batch)

    theirs = pc.add(pc.multiply(batch.column("b"), pa.scalar(2.0)),
                    pc.cast(batch.column("a"), pa.float64()))
    assert ours.equals(theirs)


@pytest.mark.parametrize("n", [17, 1000])
def test_filter_differential(n):
    rng = np.random.default_rng(7)
    batch = _random_batch(rng, n)

    na = B.make_field(SCHEMA.field("a"))
    cond = B.make_condition(
        B.make_function("greater_than", [na, B.make_int64_literal(500)],
                        dt.bool_))
    sel = g.make_filter(SCHEMA, cond).evaluate(batch)

    mask = pc.greater(batch.column("a"), pa.scalar(500, type=pa.int64()))
    expected = np.nonzero(np.asarray(mask.fill_null(False)))[0]
    np.testing.assert_array_equal(sel.to_numpy(), expected)


def test_comparison_chain_differential():
    rng = np.random.default_rng(3)
    n = 500
    batch = _random_batch(rng, n)
    na = B.make_field(SCHEMA.field("a"))
    nc = B.make_field(SCHEMA.field("c"))
    ccast = B.make_function("castBIGINT", [nc], dt.int64)
    cond = B.make_condition(B.make_or([
        B.make_and([
            B.make_function("greater_than", [na, ccast], dt.bool_),
            B.make_function("less_than", [na, B.make_int64_literal(900)],
                            dt.bool_),
        ]),
        B.make_function("equal", [na, B.make_int64_literal(0)], dt.bool_),
    ]))
    sel = g.make_filter(SCHEMA, cond).evaluate(batch)

    a = batch.column("a")
    c64 = pc.cast(batch.column("c"), pa.int64())
    m = pc.or_kleene(
        pc.and_kleene(pc.greater(a, c64), pc.less(a, pa.scalar(900))),
        pc.equal(a, pa.scalar(0, type=pa.int64())))
    expected = np.nonzero(np.asarray(m.fill_null(False)))[0]
    np.testing.assert_array_equal(sel.to_numpy(), expected)


def test_math_differential():
    rng = np.random.default_rng(11)
    n = 256
    vals = rng.random(n) * 100 + 1
    batch = pa.RecordBatch.from_arrays([pa.array(vals)], names=["b"])
    schema = dt.Schema([dt.Field("b", dt.float64)])
    nb = B.make_field(schema.field("b"))
    exprs = [
        B.make_expression(B.make_function("sqrt", [nb], dt.float64),
                          dt.Field("sqrt", dt.float64)),
        B.make_expression(B.make_function("log", [nb], dt.float64),
                          dt.Field("log", dt.float64)),
    ]
    rs = g.make_projector(schema, exprs).evaluate(batch)
    np.testing.assert_allclose(np.asarray(rs[0]), np.sqrt(vals), rtol=1e-15)
    np.testing.assert_allclose(np.asarray(rs[1]), np.log(vals), rtol=1e-15)
