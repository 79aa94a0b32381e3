"""Date/time kernel tests — differential against python's datetime (exact
civil-calendar oracle) and pyarrow.compute where semantics align."""
import datetime as pydt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt

B = g.TreeExprBuilder

EPOCH = pydt.datetime(1970, 1, 1)


def _ts_batch(dates):
    ms = [int((d - EPOCH).total_seconds() * 1000) for d in dates]
    arr = pa.array(ms, type=pa.int64()).cast(pa.timestamp("ms"))
    return pa.RecordBatch.from_arrays([arr], names=["t"])


SCHEMA = dt.Schema([dt.Field("t", dt.timestamp)])


def _project(fn_name, batch, ret=dt.int64):
    expr = B.make_expression(
        B.make_function(fn_name, [B.make_field(SCHEMA.field("t"))], ret),
        dt.Field("r", ret))
    (r,) = g.make_projector(SCHEMA, [expr]).evaluate(batch)
    if ret.is_temporal:
        r = r.cast(pa.int64())
    return np.asarray(r)


DATES = [
    pydt.datetime(1970, 1, 1, 0, 0, 0),
    pydt.datetime(2000, 2, 29, 23, 59, 59),
    pydt.datetime(1999, 12, 31, 12, 30, 45),
    pydt.datetime(2024, 3, 1, 6, 15, 0),
    pydt.datetime(1969, 7, 20, 20, 17, 40),   # pre-epoch
    pydt.datetime(1900, 1, 1, 0, 0, 1),
    pydt.datetime(2100, 12, 31, 1, 2, 3),
    pydt.datetime(2016, 1, 3, 0, 0, 0),       # ISO week 53 of 2015
    pydt.datetime(2015, 12, 28, 0, 0, 0),     # ISO week 53
    pydt.datetime(2021, 1, 1, 0, 0, 0),       # ISO week 53 of 2020
]


def test_extract_fields():
    batch = _ts_batch(DATES)
    assert list(_project("extractYear", batch)) == [d.year for d in DATES]
    assert list(_project("extractMonth", batch)) == [d.month for d in DATES]
    assert list(_project("extractDay", batch)) == [d.day for d in DATES]
    assert list(_project("extractHour", batch)) == [d.hour for d in DATES]
    assert list(_project("extractMinute", batch)) == [d.minute for d in DATES]
    assert list(_project("extractSecond", batch)) == [d.second for d in DATES]
    assert list(_project("extractDoy", batch)) == \
        [d.timetuple().tm_yday for d in DATES]
    # SQL dow: 1=Sunday..7=Saturday; python weekday(): 0=Monday
    assert list(_project("extractDow", batch)) == \
        [(d.weekday() + 1) % 7 + 1 for d in DATES]
    assert list(_project("extractWeek", batch)) == \
        [d.isocalendar()[1] for d in DATES]
    assert list(_project("extractQuarter", batch)) == \
        [(d.month - 1) // 3 + 1 for d in DATES]


def test_extract_differential_vs_arrow_random():
    rng = np.random.default_rng(5)
    ms = rng.integers(-2_000_000_000_000, 4_000_000_000_000, size=5000)
    arr = pa.array(ms, type=pa.int64()).cast(pa.timestamp("ms"))
    batch = pa.RecordBatch.from_arrays([arr], names=["t"])
    np.testing.assert_array_equal(
        _project("extractYear", batch), np.asarray(pc.year(arr)))
    np.testing.assert_array_equal(
        _project("extractMonth", batch), np.asarray(pc.month(arr)))
    np.testing.assert_array_equal(
        _project("extractDay", batch), np.asarray(pc.day(arr)))
    np.testing.assert_array_equal(
        _project("extractWeek", batch), np.asarray(pc.iso_week(arr)))
    np.testing.assert_array_equal(
        _project("extractQuarter", batch), np.asarray(pc.quarter(arr)))


def test_date_trunc():
    batch = _ts_batch(DATES)
    got = _project("date_trunc_Month", batch, dt.timestamp)
    exp = [int((pydt.datetime(d.year, d.month, 1) - EPOCH).total_seconds()
               * 1000) for d in DATES]
    assert list(got) == exp
    got = _project("date_trunc_Year", batch, dt.timestamp)
    exp = [int((pydt.datetime(d.year, 1, 1) - EPOCH).total_seconds() * 1000)
           for d in DATES]
    assert list(got) == exp
    got = _project("date_trunc_Day", batch, dt.timestamp)
    exp = [int((pydt.datetime(d.year, d.month, d.day) - EPOCH).total_seconds()
               * 1000) for d in DATES]
    assert list(got) == exp


def test_add_months_and_last_day():
    batch = _ts_batch(DATES)
    nt = B.make_field(SCHEMA.field("t"))
    expr = B.make_expression(
        B.make_function("add_months", [nt, B.make_int32_literal(13)],
                        dt.timestamp),
        dt.Field("r", dt.timestamp))
    (r,) = g.make_projector(SCHEMA, [expr]).evaluate(batch)
    ms = np.asarray(r.cast(pa.int64()))

    def py_add_months(d, n):
        tot = d.year * 12 + (d.month - 1) + n
        y, m = divmod(tot, 12)
        m += 1
        import calendar
        day = min(d.day, calendar.monthrange(y, m)[1])
        nd = pydt.datetime(y, m, day, d.hour, d.minute, d.second)
        return int((nd - EPOCH).total_seconds() * 1000)

    assert list(ms) == [py_add_months(d, 13) for d in DATES]

    got = _project("last_day", batch, dt.timestamp)
    import calendar
    exp = [int((pydt.datetime(d.year, d.month,
                              calendar.monthrange(d.year, d.month)[1])
                - EPOCH).total_seconds() * 1000) for d in DATES]
    assert list(got) == exp


def test_timestampdiff_month():
    a = [pydt.datetime(2020, 1, 31), pydt.datetime(2020, 1, 1),
         pydt.datetime(2021, 3, 15)]
    b = [pydt.datetime(2020, 2, 29), pydt.datetime(2020, 3, 1),
         pydt.datetime(2020, 3, 14)]
    schema = dt.Schema([dt.Field("t1", dt.timestamp),
                        dt.Field("t2", dt.timestamp)])
    ms = lambda ds: pa.array(
        [int((d - EPOCH).total_seconds() * 1000) for d in ds],
        type=pa.int64()).cast(pa.timestamp("ms"))
    batch = pa.RecordBatch.from_arrays([ms(a), ms(b)], names=["t1", "t2"])
    expr = B.make_expression(
        B.make_function("timestampdiffMonth",
                        [B.make_field(schema.field("t1")),
                         B.make_field(schema.field("t2"))], dt.int64),
        dt.Field("r", dt.int64))
    (r,) = g.make_projector(schema, [expr]).evaluate(batch)
    # 2020-01-31→2020-02-29: partial month (day 29 < 31) → 0;
    # 2020-01-01→2020-03-01: 2; 2021-03-15→2020-03-14: -12
    assert list(np.asarray(r)) == [0, 2, -12]


def test_datediff_and_date_add():
    schema = dt.Schema([dt.Field("t1", dt.timestamp),
                        dt.Field("t2", dt.timestamp)])
    a = [pydt.datetime(2020, 3, 1), pydt.datetime(1969, 12, 31)]
    b = [pydt.datetime(2020, 2, 1), pydt.datetime(1970, 1, 2)]
    ms = lambda ds: pa.array(
        [int((d - EPOCH).total_seconds() * 1000) for d in ds],
        type=pa.int64()).cast(pa.timestamp("ms"))
    batch = pa.RecordBatch.from_arrays([ms(a), ms(b)], names=["t1", "t2"])
    expr = B.make_expression(
        B.make_function("datediff",
                        [B.make_field(schema.field("t1")),
                         B.make_field(schema.field("t2"))], dt.int32),
        dt.Field("r", dt.int32))
    (r,) = g.make_projector(schema, [expr]).evaluate(batch)
    assert list(np.asarray(r)) == [29, -2]


def test_to_date_and_is_date():
    import gandiva_tpu as g
    schema = dt.Schema([dt.Field("s", dt.string)])
    ns = g.TreeExprBuilder.make_field(schema.field("s"))
    fmt = g.TreeExprBuilder.make_string_literal("YYYY-MM-DD")
    exprs = [
        B.make_expression(B.make_function("to_date", [ns, fmt], dt.date64),
                          dt.Field("d", dt.date64)),
        B.make_expression(B.make_function("is_date", [ns], dt.bool_),
                          dt.Field("ok", dt.bool_)),
    ]
    proj = g.make_projector(schema, exprs, use_cache=False)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(["2020-03-01", "not a date", None, "1969-12-31"])],
        names=["s"])
    d, ok = proj.evaluate(batch)
    assert d.to_pylist() == [pydt.date(2020, 3, 1), None, None,
                             pydt.date(1969, 12, 31)]
    assert ok.to_pylist() == [True, False, False, True]


def test_cast_timestamp_from_string():
    import gandiva_tpu as g
    schema = dt.Schema([dt.Field("s", dt.string)])
    ns = g.TreeExprBuilder.make_field(schema.field("s"))
    e = B.make_expression(B.make_function("castTIMESTAMP", [ns],
                                          dt.timestamp),
                          dt.Field("t", dt.timestamp))
    (r,) = g.make_projector(schema, [e], use_cache=False).evaluate(
        pa.RecordBatch.from_arrays(
            [pa.array(["2020-03-01 12:30:45", "2020-03-01", "zz"])],
            names=["s"]))
    assert r.to_pylist() == [pydt.datetime(2020, 3, 1, 12, 30, 45),
                             pydt.datetime(2020, 3, 1), None]


# ---------------------------------------------------------------------------
# r4: interval day/year types (VERDICT r3 #7)
# ---------------------------------------------------------------------------

def test_timestamp_plus_interval_day_literal():
    import datetime as dtm
    schema = dt.Schema([dt.Field("t", dt.timestamp)])
    base = int(dtm.datetime(2020, 3, 30, 12, 0, 0,
                            tzinfo=dtm.timezone.utc).timestamp() * 1000)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([base], type=pa.timestamp("ms"))], names=["t"])
    iv = B.make_interval_day_literal(2, 3_600_000)   # 2 days + 1 hour
    expr = B.make_expression(
        B.make_function("add", [B.make_field(schema.field("t")), iv],
                        dt.timestamp), dt.Field("r", dt.timestamp))
    (r,) = g.make_projector(schema, [expr], use_cache=False).evaluate(batch)
    got = r.cast(pa.int64()).to_pylist()[0]
    assert got == base + 2 * 86_400_000 + 3_600_000

    # subtract
    expr2 = B.make_expression(
        B.make_function("subtract", [B.make_field(schema.field("t")), iv],
                        dt.timestamp), dt.Field("r", dt.timestamp))
    (r2,) = g.make_projector(schema, [expr2], use_cache=False).evaluate(batch)
    assert r2.cast(pa.int64()).to_pylist()[0] == \
        base - 2 * 86_400_000 - 3_600_000


def test_timestamp_plus_interval_year_calendar():
    import datetime as dtm
    schema = dt.Schema([dt.Field("t", dt.timestamp)])
    # Jan 31 + 1 month -> Feb 29 (leap year, clamped day), the
    # add_months calendar rule
    base = int(dtm.datetime(2020, 1, 31, 6, 30, 0,
                            tzinfo=dtm.timezone.utc).timestamp() * 1000)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([base], type=pa.timestamp("ms"))], names=["t"])
    iv = B.make_interval_year_literal(1)
    expr = B.make_expression(
        B.make_function("add", [B.make_field(schema.field("t")), iv],
                        dt.timestamp), dt.Field("r", dt.timestamp))
    (r,) = g.make_projector(schema, [expr], use_cache=False).evaluate(batch)
    exp = int(dtm.datetime(2020, 2, 29, 6, 30, 0,
                           tzinfo=dtm.timezone.utc).timestamp() * 1000)
    assert r.cast(pa.int64()).to_pylist()[0] == exp


def test_cast_interval_and_column_arithmetic():
    schema = dt.Schema([dt.Field("t", dt.timestamp), dt.Field("n", dt.int64)])
    base = 1_600_000_000_000
    batch = pa.RecordBatch.from_arrays(
        [pa.array([base, base], type=pa.timestamp("ms")),
         pa.array([90_061_000, 86_400_000])], names=["t", "n"])  # ms
    iv = B.make_function("castINTERVALDAY", [B.make_field(schema.field("n"))],
                         dt.interval_day)
    expr = B.make_expression(
        B.make_function("add", [B.make_field(schema.field("t")), iv],
                        dt.timestamp), dt.Field("r", dt.timestamp))
    (r,) = g.make_projector(schema, [expr], use_cache=False).evaluate(batch)
    assert r.cast(pa.int64()).to_pylist() == [base + 90_061_000,
                                              base + 86_400_000]


def test_interval_and_alias_signatures_visible():
    sigs = g.get_registered_function_signatures()
    names = set()
    by_name = {}
    for s in sigs:
        names.add(s.name)
        by_name.setdefault(s.name, []).append(s)
    assert "castINTERVALDAY" in names
    assert "castINTERVALYEAR" in names
    assert "hash" in names               # alias surfaced (gandiva parity)
    assert "castNULLABLEINTERVALDAY" in names
    itypes = [s for s in by_name["add"]
              if any(str(t) == "interval_day" for t in s.param_types)]
    assert itypes, "add(timestamp, interval_day) must be enumerated"
    # castVARCHAR(decimal) appears once a decimal type is registered
    from gandiva_tpu.registry import decimal_ops
    decimal_ops.ensure_registered([dt.decimal128(10, 2)])
    sigs2 = g.get_registered_function_signatures()
    assert any(s.name == "castVARCHAR"
               and any("decimal" in str(t) for t in s.param_types)
               for s in sigs2)
