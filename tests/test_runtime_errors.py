"""Status-parity runtime errors (VERDICT r4 #7): with
Configuration(raise_errors=True) the engine surfaces Evaluate-time errors —
integer/decimal divide-by-zero, castDECIMAL precision overflow — as Python
exceptions at the Evaluate boundary, matching the reference's
Status-from-Evaluate contract (gandiva raises "divide by zero error" from
Projector::Evaluate). Also covers the UINT16 selection capacity bound
(libgandiva.pxd:58-71: typed selection vectors bound their index range at
construction).
"""
import numpy as np
import pyarrow as pa
import pytest

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.registry.registry import EvaluationError

B = g.TreeExprBuilder

RAISING = g.ConfigurationBuilder().with_raise_errors(True).build()


def _div_projector(config, dtype=dt.int64):
    fa, fb = dt.Field("a", dtype), dt.Field("b", dtype)
    schema = dt.Schema([fa, fb])
    node = B.make_function("divide", [B.make_field(fa), B.make_field(fb)],
                           dtype)
    expr = B.make_expression(node, dt.Field("out", dtype))
    return g.make_projector(schema, [expr], config=config, use_cache=False)


def test_divide_by_zero_raises():
    proj = _div_projector(RAISING)
    a = pa.array([10, 20, 30], type=pa.int64())
    b = pa.array([2, 0, 5], type=pa.int64())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    with pytest.raises(EvaluationError, match="divide by zero error"):
        proj.evaluate(batch)


def test_divide_by_zero_default_is_silent():
    proj = _div_projector(None)
    a = pa.array([10, 20, 30], type=pa.int64())
    b = pa.array([2, 0, 5], type=pa.int64())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    (r,) = proj.evaluate(batch)
    assert r.to_pylist() == [5, 0, 6]  # documented divergence when off


def test_divide_by_zero_null_rows_do_not_raise():
    # a null divisor row never executes the reference kernel body, so it
    # cannot raise — only valid rows with b == 0 do
    proj = _div_projector(RAISING)
    a = pa.array([10, 20, 30], type=pa.int64())
    b = pa.array([2, None, 5], type=pa.int64())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    (r,) = proj.evaluate(batch)
    assert r.to_pylist() == [5, None, 6]


def test_mod_by_zero_raises():
    fa, fb = dt.Field("a", dt.int32), dt.Field("b", dt.int32)
    schema = dt.Schema([fa, fb])
    node = B.make_function("mod", [B.make_field(fa), B.make_field(fb)],
                           dt.int32)
    expr = B.make_expression(node, dt.Field("out", dt.int32))
    proj = g.make_projector(schema, [expr], config=RAISING, use_cache=False)
    a = pa.array([10, 20], type=pa.int32())
    b = pa.array([3, 0], type=pa.int32())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    with pytest.raises(EvaluationError, match="divide by zero error"):
        proj.evaluate(batch)


def test_float_divide_by_zero_never_raises():
    # the reference only raises for integer/decimal division; float x/0
    # follows IEEE (inf)
    proj = _div_projector(RAISING, dt.float64)
    a = pa.array([10.0, 20.0], type=pa.float64())
    b = pa.array([2.0, 0.0], type=pa.float64())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    (r,) = proj.evaluate(batch)
    assert r.to_pylist()[0] == 5.0
    assert np.isinf(r.to_pylist()[1])


def test_decimal_divide_by_zero_raises():
    d = dt.decimal128(10, 2)
    fa, fb = dt.Field("a", d), dt.Field("b", d)
    schema = dt.Schema([fa, fb])
    out_t = dt.decimal128(38, 13 - 2 + 2 + 4)  # engine result-type rule
    from gandiva_tpu.registry.decimal_ops import result_type
    out_t = result_type("divide", d, d)
    node = B.make_function("divide", [B.make_field(fa), B.make_field(fb)],
                           out_t)
    expr = B.make_expression(node, dt.Field("out", out_t))
    proj = g.make_projector(schema, [expr], config=RAISING, use_cache=False)
    import decimal
    a = pa.array([decimal.Decimal("1.00")], type=pa.decimal128(10, 2))
    b = pa.array([decimal.Decimal("0.00")], type=pa.decimal128(10, 2))
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    with pytest.raises(EvaluationError, match="divide by zero error"):
        proj.evaluate(batch)


def test_cast_decimal_overflow_raises():
    fa = dt.Field("a", dt.int64)
    schema = dt.Schema([fa])
    target = dt.decimal128(4, 2)  # 2 integer digits only
    node = B.make_function("castDECIMAL", [B.make_field(fa)], target)
    expr = B.make_expression(node, dt.Field("out", target))
    proj = g.make_projector(schema, [expr], config=RAISING, use_cache=False)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([12345], type=pa.int64())], names=["a"])
    with pytest.raises(EvaluationError, match="castDECIMAL"):
        proj.evaluate(batch)
    # in-range values pass
    ok = pa.RecordBatch.from_arrays([pa.array([12], type=pa.int64())],
                                    names=["a"])
    (r,) = proj.evaluate(ok)
    import decimal
    assert r.to_pylist() == [decimal.Decimal("12.00")]


def test_filter_raises_too():
    fa, fb = dt.Field("a", dt.int64), dt.Field("b", dt.int64)
    schema = dt.Schema([fa, fb])
    cond = B.make_condition(B.make_function(
        "greater_than",
        [B.make_function("divide", [B.make_field(fa), B.make_field(fb)],
                         dt.int64),
         B.make_int64_literal(1)], dt.bool_))
    filt = g.make_filter(schema, cond, config=RAISING, use_cache=False)
    a = pa.array([10, 20], type=pa.int64())
    b = pa.array([0, 5], type=pa.int64())
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    with pytest.raises(EvaluationError, match="divide by zero error"):
        filt.evaluate(batch)


def test_uint16_selection_bound():
    fa = dt.Field("a", dt.int64)
    schema = dt.Schema([fa])
    cond = B.make_condition(B.make_function(
        "greater_than", [B.make_field(fa), B.make_int64_literal(10)],
        dt.bool_))
    filt = g.make_filter(schema, cond, use_cache=False)
    n = (1 << 16) + 128
    batch = pa.RecordBatch.from_arrays(
        [pa.array(np.arange(n, dtype=np.int64))], names=["a"])
    with pytest.raises(ValueError, match="UINT16"):
        filt.evaluate(batch, mode=g.SelectionMode.UINT16)
    # UINT32 on the same batch is fine
    sel = filt.evaluate(batch, mode=g.SelectionMode.UINT32)
    assert len(sel) == n - 11

    import jax.numpy as jnp
    with pytest.raises(ValueError, match="UINT16"):
        g.SelectionVector.from_mask(jnp.ones((n,), bool),
                                    mode=g.SelectionMode.UINT16)
