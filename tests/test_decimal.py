"""Decimal128 tests — int128 limb math vs python ints; end-to-end decimal
expressions vs python Decimal (exact oracle)."""
import decimal as pydec

import numpy as np
import pyarrow as pa
import pytest

import jax.numpy as jnp

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.utils import int128 as i128

B = g.TreeExprBuilder


def _to_limbs(vals):
    hi = np.array([v >> 64 for v in vals], dtype=object)
    lo = np.array([v & 0xFFFF_FFFF_FFFF_FFFF for v in vals], dtype=object)
    lo = np.array([x - (1 << 64) if x >= (1 << 63) else x for x in lo],
                  dtype=np.int64)
    hi = hi.astype(np.int64)
    return jnp.asarray(hi), jnp.asarray(lo)


def _from_limbs(hi, lo):
    hi = np.asarray(hi).astype(object)
    lo = np.asarray(lo).astype(object)
    return [int(h) * (1 << 64) + (int(l) & 0xFFFF_FFFF_FFFF_FFFF)
            for h, l in zip(hi, lo)]


CASES = [0, 1, -1, 7, -7, 10 ** 18, -(10 ** 18), 10 ** 37, -(10 ** 37),
         123456789012345678901234567890, -999999999999999999999999]


def test_int128_roundtrip_add_sub():
    rng = np.random.default_rng(0)
    a = CASES + [int(x) for x in rng.integers(-10**17, 10**17, 20)]
    b = list(reversed(a))
    ah, al = _to_limbs(a)
    bh, bl = _to_limbs(b)
    sh, sl = i128.add128(ah, al, bh, bl)
    assert _from_limbs(sh, sl) == [_wrap128(x + y) for x, y in zip(a, b)]
    dh, dl = i128.sub128(ah, al, bh, bl)
    assert _from_limbs(dh, dl) == [_wrap128(x - y) for x, y in zip(a, b)]


def _wrap128(v):
    v &= (1 << 128) - 1
    if v >= 1 << 127:
        v -= 1 << 128
    return v


def test_int128_mul():
    rng = np.random.default_rng(1)
    a = [int(x) for x in rng.integers(-10**17, 10**17, 30)]
    b = [int(x) for x in rng.integers(-10**17, 10**17, 30)]
    hi, lo = i128.mul_i64(jnp.asarray(np.array(a, dtype=np.int64)),
                          jnp.asarray(np.array(b, dtype=np.int64)))
    assert _from_limbs(hi, lo) == [x * y for x, y in zip(a, b)]


def test_int128_divmod():
    rng = np.random.default_rng(2)
    a = [int(x) for x in rng.integers(-10**17, 10**17, 10)] \
        + [10 ** 30, -(10 ** 30), 12345678901234567890123456789]
    b = [int(x) for x in rng.integers(1, 10**12, 10)] + [997, 10 ** 15, -7]
    ah, al = _to_limbs(a)
    bh, bl = _to_limbs(b)
    qh, ql, rh, rl = i128.divmod128(ah, al, bh, bl)
    qs = _from_limbs(qh, ql)
    rs = _from_limbs(rh, rl)
    for x, y, q, r in zip(a, b, qs, rs):
        eq = int(x / y) if abs(x) < 2**52 and abs(y) < 2**52 else \
            (abs(x) // abs(y)) * (1 if (x >= 0) == (y >= 0) else -1)
        er = x - eq * y
        assert q == eq, (x, y, q, eq)
        assert r == er, (x, y, r, er)


def test_int128_pow10():
    a = [3, -3, 123456, -987654]
    ah, al = _to_limbs(a)
    hi, lo = i128.mul_pow10(ah, al, 20)
    assert _from_limbs(hi, lo) == [x * 10 ** 20 for x in a]
    # rounded division: half away from zero
    v = [15, 25, -15, -25, 14, -14]
    vh, vl = _to_limbs(v)
    hi, lo = i128.div_pow10_round(vh, vl, 1)
    assert _from_limbs(hi, lo) == [2, 3, -2, -3, 1, -1]


def _dec_batch(strs, precision, scale, name="d"):
    arr = pa.array([None if s is None else pydec.Decimal(s) for s in strs],
                   type=pa.decimal128(precision, scale))
    return pa.RecordBatch.from_arrays([arr], names=[name])


def test_decimal_projector_add():
    t = dt.decimal128(12, 2)
    schema = dt.Schema([dt.Field("d", t)])
    nd = B.make_field(schema.field("d"))
    lit = B.make_decimal_literal("1.25", 12, 2)
    from gandiva_tpu.registry.decimal_ops import result_type
    rt = result_type("add", t, t)
    expr = B.make_expression(B.make_function("add", [nd, lit], rt),
                             dt.Field("r", rt))
    proj = g.make_projector(schema, [expr], use_cache=False)
    batch = _dec_batch(["10.50", "-3.75", None, "0.01"], 12, 2)
    (r,) = proj.evaluate(batch)
    assert r.type == pa.decimal128(rt.precision, rt.scale)
    assert [None if v is None else str(v) for v in r.to_pylist()] == \
        ["11.75", "-2.50", None, "1.26"]


def test_decimal_multiply_divide():
    t = dt.decimal128(12, 2)
    schema = dt.Schema([dt.Field("a", t), dt.Field("b", t)])
    na, nb = B.make_field(schema.field("a")), B.make_field(schema.field("b"))
    from gandiva_tpu.registry.decimal_ops import result_type
    rt_mul = result_type("multiply", t, t)
    rt_div = result_type("divide", t, t)
    exprs = [
        B.make_expression(B.make_function("multiply", [na, nb], rt_mul),
                          dt.Field("m", rt_mul)),
        B.make_expression(B.make_function("divide", [na, nb], rt_div),
                          dt.Field("q", rt_div)),
    ]
    proj = g.make_projector(schema, exprs, use_cache=False)
    a = pa.array([pydec.Decimal("12.34"), pydec.Decimal("-5.00"),
                  pydec.Decimal("100.00")], type=pa.decimal128(12, 2))
    b = pa.array([pydec.Decimal("2.00"), pydec.Decimal("3.00"),
                  pydec.Decimal("7.00")], type=pa.decimal128(12, 2))
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    m, q = proj.evaluate(batch)
    assert [str(v) for v in m.to_pylist()] == ["24.6800", "-15.0000",
                                               "700.0000"]
    # divide scale: max(6, 2+12+1)=15 → adjusted to fit 38
    ctx = pydec.Context(prec=50)
    for got, (x, y) in zip(q.to_pylist(),
                           [(pydec.Decimal("12.34"), pydec.Decimal("2.00")),
                            (pydec.Decimal("-5.00"), pydec.Decimal("3.00")),
                            (pydec.Decimal("100.00"), pydec.Decimal("7.00"))]):
        expect = (x / y).quantize(pydec.Decimal(1).scaleb(-q.type.scale),
                                  rounding=pydec.ROUND_HALF_UP, context=ctx)
        assert got == expect, (got, expect)


def test_decimal_compare_filter():
    t = dt.decimal128(10, 2)
    schema = dt.Schema([dt.Field("d", t)])
    nd = B.make_field(schema.field("d"))
    lit = B.make_decimal_literal("5.00", 10, 2)
    cond = B.make_condition(
        B.make_function("greater_than", [nd, lit], dt.bool_))
    filt = g.make_filter(schema, cond, use_cache=False)
    batch = _dec_batch(["4.99", "5.00", "5.01", None, "1000.00"], 10, 2)
    sel = filt.evaluate(batch)
    np.testing.assert_array_equal(sel.to_numpy(), [2, 4])


def test_decimal_abs_round_cast():
    t = dt.decimal128(10, 2)
    schema = dt.Schema([dt.Field("d", t)])
    nd = B.make_field(schema.field("d"))
    exprs = [
        B.make_expression(B.make_function("abs", [nd], t),
                          dt.Field("a", t)),
        B.make_expression(B.make_function("castBIGINT", [nd], dt.int64),
                          dt.Field("i", dt.int64)),
        B.make_expression(B.make_function("castFLOAT8", [nd], dt.float64),
                          dt.Field("f", dt.float64)),
    ]
    proj = g.make_projector(schema, exprs, use_cache=False)
    batch = _dec_batch(["-3.50", "2.49", "2.50"], 10, 2)
    a, i, f = proj.evaluate(batch)
    assert [str(v) for v in a.to_pylist()] == ["3.50", "2.49", "2.50"]
    assert i.to_pylist() == [-4, 2, 3]  # round half away from zero
    np.testing.assert_allclose(np.asarray(f), [-3.5, 2.49, 2.5])


def test_cast_decimal_rescale_and_from_numeric():
    t = dt.decimal128(10, 2)
    schema = dt.Schema([dt.Field("d", t), dt.Field("i", dt.int64),
                        dt.Field("f", dt.float64)])
    nd = B.make_field(schema.field("d"))
    ni = B.make_field(schema.field("i"))
    nf = B.make_field(schema.field("f"))
    up = dt.decimal128(12, 4)
    down = dt.decimal128(10, 1)
    exprs = [
        B.make_expression(B.make_function("castDECIMAL", [nd], up),
                          dt.Field("u", up)),
        B.make_expression(B.make_function("castDECIMAL", [nd], down),
                          dt.Field("w", down)),
        B.make_expression(B.make_function("castDECIMAL", [ni], t),
                          dt.Field("x", t)),
        B.make_expression(B.make_function("castDECIMAL", [nf], t),
                          dt.Field("y", t)),
    ]
    proj = g.make_projector(schema, exprs, use_cache=False)
    import pyarrow as pa
    batch = pa.RecordBatch.from_arrays(
        [pa.array([pydec.Decimal("1.25"), pydec.Decimal("-3.45"),
                   pydec.Decimal("99.99")], type=pa.decimal128(10, 2)),
         pa.array([7, -12, 0], type=pa.int64()),
         pa.array([1.005, -2.5, 3.14159], type=pa.float64())],
        names=["d", "i", "f"])
    u, w, x, y = proj.evaluate(batch)
    assert [str(v) for v in u.to_pylist()] == ["1.2500", "-3.4500",
                                               "99.9900"]
    # downscale rounds half away from zero
    assert [str(v) for v in w.to_pylist()] == ["1.3", "-3.5", "100.0"]
    assert [str(v) for v in x.to_pylist()] == ["7.00", "-12.00", "0.00"]
    # 1.005 is not exactly representable (1.00499...) → rounds to 1.00
    assert [str(v) for v in y.to_pylist()] == ["1.00", "-2.50", "3.14"]


def test_cast_decimal_null_on_overflow():
    t = dt.decimal128(20, 0)
    target = dt.decimal128(3, 1)  # max |v| < 10^3 at scale 1 → |x| < 100
    schema = dt.Schema([dt.Field("d", t)])
    nd = B.make_field(schema.field("d"))
    expr = B.make_expression(
        B.make_function("castDECIMALNullOnOverflow", [nd], target),
        dt.Field("r", target))
    proj = g.make_projector(schema, [expr], use_cache=False)
    import pyarrow as pa
    batch = pa.RecordBatch.from_arrays(
        [pa.array([pydec.Decimal(9), pydec.Decimal(99),
                   pydec.Decimal(100), pydec.Decimal(-100), None],
                  type=pa.decimal128(20, 0))], names=["d"])
    (r,) = proj.evaluate(batch)
    assert [None if v is None else str(v) for v in r.to_pylist()] == \
        ["9.0", "99.0", None, None, None]


def test_int128_mul256_div_pow10():
    """decimal_xlarge unit: 256-bit product / 10^k, round half away,
    vs exact python ints."""
    rng = np.random.default_rng(5)
    a = [int(x) for x in rng.integers(-10**18, 10**18, 16)]
    a = [x * (10 ** 7) + int(s) for x, s in
         zip(a, rng.integers(-10**6, 10**6, 16))]        # ~25-digit values
    b = list(reversed(a))
    a += [0, 10 ** 37, -(10 ** 37), 5, -5]
    b += [10 ** 30, 3, 3, -10 ** 24, 10 ** 24]
    for k in (0, 1, 7, 12, 19, 38):
        ah, al = _to_limbs(a)
        bh, bl = _to_limbs(b)
        hi, lo = i128.mul256_div_pow10(ah, al, bh, bl, k)
        got = _from_limbs(hi, lo)
        for g_, x, y in zip(got, a, b):
            p = x * y
            d = 10 ** k
            exp = (abs(p) + d // 2) // d if k else abs(p)
            exp = -exp if p < 0 else exp
            assert g_ == _wrap128(exp), (x, y, k, g_, _wrap128(exp))


def test_decimal_xlarge_multiply():
    """Both operands wider than 18 digits → the 256-bit intermediate path
    (reference decimal_xlarge.cc), vs python Decimal with explicit
    half-up quantization at the adjusted result scale."""
    t1, t2 = dt.decimal128(25, 5), dt.decimal128(25, 8)
    schema = dt.Schema([dt.Field("a", t1), dt.Field("b", t2)])
    na, nb = B.make_field(schema.field("a")), B.make_field(schema.field("b"))
    from gandiva_tpu.registry.decimal_ops import result_type
    rt = result_type("multiply", t1, t2)
    assert rt.precision == 38 and rt.scale < 13   # adjusted: xlarge rescale
    expr = B.make_expression(B.make_function("multiply", [na, nb], rt),
                             dt.Field("m", rt))
    proj = g.make_projector(schema, [expr], use_cache=False)
    avals = ["12345678901234567890.12345", "-0.00001",
             "99999999999999999999.99999", "31415926535897932.38462", None]
    bvals = ["987654321.87654321", "12345678901234567.89012345",
             "-11111111111111111.1", "2.71828182", "1.0"]
    a = pa.array([None if v is None else pydec.Decimal(v) for v in avals],
                 type=pa.decimal128(25, 5))
    b = pa.array([pydec.Decimal(v) for v in bvals], type=pa.decimal128(25, 8))
    batch = pa.RecordBatch.from_arrays([a, b], names=["a", "b"])
    (m,) = proj.evaluate(batch)
    assert m.type == pa.decimal128(rt.precision, rt.scale)
    for got, x, y in zip(m.to_pylist(), avals, bvals):
        if x is None:
            assert got is None
            continue
        # exact oracle in the unscaled-int domain; values whose rescaled
        # product exceeds 38 digits wrap at 128 bits (same as the other
        # decimal kernels — gandiva flags overflow, result undefined)
        ux = int(pydec.Decimal(x).scaleb(5))
        uy = int(pydec.Decimal(y).scaleb(8))
        k = 5 + 8 - rt.scale
        p = ux * uy
        d = 10 ** k
        exp = (abs(p) + d // 2) // d
        exp = -exp if p < 0 else exp
        wide = pydec.Context(prec=60)
        got_unscaled = int(got.scaleb(rt.scale, wide))
        assert got_unscaled == _wrap128(exp), (x, y, got, exp)
