"""Date/time kernels.

TPU-native counterpart of Gandiva's precompiled/time.cc and
timestamp_arithmetic.cc (SURVEY.md §2b "Date/time"): extract*, date_trunc_*,
date/timestamp casts, timestampadd/timestampdiff, add_months, datediff,
last_day, next_day, unix_timestamp/from_unixtime.

Representation (dtypes.py): date32 = days since epoch (int32), date64 and
timestamp = milliseconds since epoch (int64), time32 = millis since midnight,
time64 = micros since midnight. All civil-calendar math uses the
days↔(y,m,d) bijection from Howard Hinnant's public-domain algorithms,
vectorized as pure integer jnp ops (floor division semantics are exactly
what's needed for pre-epoch dates; jnp ``//`` floors).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import dtypes as dt
from .registry import Nullability, Val, global_registry

_R = global_registry()

MS_PER_DAY = 86_400_000
MS_PER_HOUR = 3_600_000
MS_PER_MINUTE = 60_000
MS_PER_SECOND = 1_000

DATE_TYPES = [dt.date32, dt.date64, dt.timestamp]


# ---------------------------------------------------------------------------
# civil calendar core
# ---------------------------------------------------------------------------

def civil_from_days(days):
    """days since 1970-01-01 → (year, month, day), all int32 arrays."""
    z = days.astype(jnp.int64) + 719468
    era = z // 146097
    doe = z - era * 146097                       # [0, 146096]
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)   # [0, 365]
    mp = (5 * doy + 2) // 153                    # [0, 11]
    d = doy - (153 * mp + 2) // 5 + 1            # [1, 31]
    m = jnp.where(mp < 10, mp + 3, mp - 9)       # [1, 12]
    year = y + (m <= 2)
    return (year.astype(jnp.int64), m.astype(jnp.int64), d.astype(jnp.int64))


def days_from_civil(y, m, d):
    """(year, month, day) → days since 1970-01-01 (int64)."""
    y = y.astype(jnp.int64) - (m <= 2)
    era = y // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def is_leap(y):
    return (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))


def days_in_month(y, m):
    base = jnp.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                     dtype=jnp.int64)
    d = base[(m - 1).astype(jnp.int32)]
    return jnp.where((m == 2) & is_leap(y), 29, d)


def _to_days(val: Val):
    """Any date/timestamp column → days since epoch (floored)."""
    if val.dtype.kind is dt.TypeKind.DATE32:
        return val.value.astype(jnp.int64)
    return val.value // MS_PER_DAY


def _to_millis(val: Val):
    if val.dtype.kind is dt.TypeKind.DATE32:
        return val.value.astype(jnp.int64) * MS_PER_DAY
    return val.value


# ---------------------------------------------------------------------------
# extract* (return int64, matching gandiva's extract signatures)
# ---------------------------------------------------------------------------

def _extract_year(v):
    y, _, _ = civil_from_days(v)
    return y


def _extract_month(v):
    _, m, _ = civil_from_days(v)
    return m


def _extract_day(v):
    _, _, d = civil_from_days(v)
    return d


def _extract_quarter(v):
    _, m, _ = civil_from_days(v)
    return (m - 1) // 3 + 1


def _extract_doy(v):
    y, _, _ = civil_from_days(v)
    jan1 = days_from_civil(y, jnp.ones_like(y), jnp.ones_like(y))
    return v.astype(jnp.int64) - jan1 + 1


def _extract_dow(v):
    # SQL/Gandiva convention: 1 = Sunday .. 7 = Saturday.
    # 1970-01-01 (days=0) was a Thursday.
    return (v.astype(jnp.int64) + 4) % 7 + 1


def _iso_dow(v):
    # ISO: 1 = Monday .. 7 = Sunday
    return (v.astype(jnp.int64) + 3) % 7 + 1


def _weeks_in_iso_year(y):
    p = (y + y // 4 - y // 100 + y // 400) % 7
    py = y - 1
    p_prev = (py + py // 4 - py // 100 + py // 400) % 7
    return 52 + ((p == 4) | (p_prev == 3))


def _extract_week(v):
    """ISO-8601 week number."""
    days = v.astype(jnp.int64)
    y, _, _ = civil_from_days(days)
    doy = _extract_doy(days)
    dow = _iso_dow(days)
    w0 = (doy - dow + 10) // 7
    return jnp.where(w0 < 1, _weeks_in_iso_year(y - 1),
                     jnp.where(w0 > _weeks_in_iso_year(y), 1, w0))


_DAY_EXTRACTORS = {
    "extractYear": _extract_year,
    "extractMonth": _extract_month,
    "extractDay": _extract_day,
    "extractQuarter": _extract_quarter,
    "extractDoy": _extract_doy,
    "extractDow": _extract_dow,
    "extractWeek": _extract_week,
}

for _name, _f in _DAY_EXTRACTORS.items():
    def _impl(ctx, args, _f=_f):
        return _f(_to_days(args[0])).astype(jnp.int64)
    for _t in DATE_TYPES:
        _R.register(_name, [_t], dt.int64, _impl)


def _register_time_extract(name, f):
    def impl(ctx, args):
        return f(_to_millis(args[0])).astype(jnp.int64)
    for t in [dt.date64, dt.timestamp]:
        _R.register(name, [t], dt.int64, impl)


_register_time_extract("extractHour", lambda ms: (ms // MS_PER_HOUR) % 24)
_register_time_extract("extractMinute", lambda ms: (ms // MS_PER_MINUTE) % 60)
_register_time_extract("extractSecond", lambda ms: (ms // MS_PER_SECOND) % 60)
_register_time_extract("extractMillennium",
                       lambda ms: (_extract_year(ms // MS_PER_DAY) + 999) // 1000)
_register_time_extract("extractCentury",
                       lambda ms: (_extract_year(ms // MS_PER_DAY) + 99) // 100)
_register_time_extract("extractDecade",
                       lambda ms: _extract_year(ms // MS_PER_DAY) // 10)
_register_time_extract("extractEpoch", lambda ms: ms // MS_PER_SECOND)

# time32 (millis since midnight) hour/minute/second
for _name, _f in [("extractHour", lambda v: v // MS_PER_HOUR),
                  ("extractMinute", lambda v: (v // MS_PER_MINUTE) % 60),
                  ("extractSecond", lambda v: (v // MS_PER_SECOND) % 60)]:
    def _impl(ctx, args, _f=_f):
        return _f(args[0].value.astype(jnp.int64))
    _R.register(_name, [dt.time32], dt.int64, _impl)


# ---------------------------------------------------------------------------
# date_trunc_*
# ---------------------------------------------------------------------------

def _trunc_to_days_fn(unit):
    def f(days):
        y, m, d = civil_from_days(days)
        one = jnp.ones_like(y)
        if unit == "Year":
            return days_from_civil(y, one, one)
        if unit == "Quarter":
            qm = ((m - 1) // 3) * 3 + 1
            return days_from_civil(y, qm, one)
        if unit == "Month":
            return days_from_civil(y, m, one)
        if unit == "Week":
            # truncate to Monday
            return days - (_iso_dow(days) - 1)
        if unit == "Decade":
            return days_from_civil((y // 10) * 10, one, one)
        if unit == "Century":
            return days_from_civil(((y + 99) // 100) * 100 - 99, one, one)
        if unit == "Millennium":
            return days_from_civil(((y + 999) // 1000) * 1000 - 999, one, one)
        raise AssertionError(unit)
    return f


for _unit in ["Year", "Quarter", "Month", "Week", "Decade", "Century",
              "Millennium"]:
    _dayf = _trunc_to_days_fn(_unit)

    def _impl_ms(ctx, args, _dayf=_dayf):
        ms = _to_millis(args[0])
        return _dayf(ms // MS_PER_DAY) * MS_PER_DAY

    def _impl_d32(ctx, args, _dayf=_dayf):
        return _dayf(args[0].value.astype(jnp.int64)).astype(jnp.int32)

    for _t in [dt.date64, dt.timestamp]:
        _R.register(f"date_trunc_{_unit}", [_t], _t, _impl_ms)
    _R.register(f"date_trunc_{_unit}", [dt.date32], dt.date32, _impl_d32)

for _unit, _msq in [("Day", MS_PER_DAY), ("Hour", MS_PER_HOUR),
                    ("Minute", MS_PER_MINUTE), ("Second", MS_PER_SECOND)]:
    def _impl(ctx, args, _msq=_msq):
        ms = _to_millis(args[0])
        return (ms // _msq) * _msq
    for _t in [dt.date64, dt.timestamp]:
        _R.register(f"date_trunc_{_unit}", [_t], _t, _impl)


# ---------------------------------------------------------------------------
# casts between temporal types
# ---------------------------------------------------------------------------

def _cast_date_from_ts(ctx, args):
    """castDATE(timestamp) → date64 truncated to day (gandiva semantics)."""
    ms = args[0].value
    return (ms // MS_PER_DAY) * MS_PER_DAY


_R.register("castDATE", [dt.timestamp], dt.date64, _cast_date_from_ts)
_R.register("castDATE", [dt.date64], dt.date64,
            lambda ctx, args: (args[0].value // MS_PER_DAY) * MS_PER_DAY)
_R.register("castDATE", [dt.int64], dt.date64,
            lambda ctx, args: args[0].value)
_R.register("castDATE", [dt.date32], dt.date64,
            lambda ctx, args: args[0].value.astype(jnp.int64) * MS_PER_DAY)

_R.register("castTIMESTAMP", [dt.date64], dt.timestamp,
            lambda ctx, args: args[0].value)
_R.register("castTIMESTAMP", [dt.date32], dt.timestamp,
            lambda ctx, args: args[0].value.astype(jnp.int64) * MS_PER_DAY)
_R.register("castTIMESTAMP", [dt.int64], dt.timestamp,
            lambda ctx, args: args[0].value)

_R.register("castDATE32", [dt.date64], dt.date32,
            lambda ctx, args: (args[0].value // MS_PER_DAY).astype(jnp.int32))
_R.register("castBIGINT", [dt.timestamp], dt.int64,
            lambda ctx, args: args[0].value)
_R.register("castBIGINT", [dt.date64], dt.int64,
            lambda ctx, args: args[0].value)


# ---------------------------------------------------------------------------
# arithmetic: date_add / date_sub / datediff / add_months / months_between
# ---------------------------------------------------------------------------

def _date_add_days(ctx, args):
    a, b = args
    if a.dtype.is_temporal:
        datev, intv = a, b
    else:
        datev, intv = b, a
    days = intv.value.astype(jnp.int64)
    if datev.dtype.kind is dt.TypeKind.DATE32:
        return (datev.value.astype(jnp.int64) + days).astype(jnp.int32)
    return datev.value + days * MS_PER_DAY


def _date_sub_days(ctx, args):
    a, b = args
    days = b.value.astype(jnp.int64)
    if a.dtype.kind is dt.TypeKind.DATE32:
        return (a.value.astype(jnp.int64) - days).astype(jnp.int32)
    return a.value - days * MS_PER_DAY


for _dt_ in DATE_TYPES:
    for _it in [dt.int32, dt.int64]:
        _R.register("date_add", [_dt_, _it], _dt_, _date_add_days,
                    aliases=["add"])
        _R.register("date_add", [_it, _dt_], _dt_, _date_add_days)
        _R.register("date_sub", [_dt_, _it], _dt_, _date_sub_days,
                    aliases=["subtract", "date_diff"])

for _dt_ in [dt.date64, dt.timestamp]:
    _R.register(
        "datediff", [_dt_, _dt_], dt.int32,
        lambda ctx, args: (
            (args[0].value // MS_PER_DAY)
            - (args[1].value // MS_PER_DAY)).astype(jnp.int32))


def _add_months_days(days, months):
    y, m, d = civil_from_days(days)
    tot = (y * 12 + (m - 1)) + months
    ny, nm = tot // 12, tot % 12 + 1
    nd = jnp.minimum(d, days_in_month(ny, nm))
    return days_from_civil(ny, nm, nd)


def _add_months(ctx, args):
    datev, mv = args
    months = mv.value.astype(jnp.int64)
    if datev.dtype.kind is dt.TypeKind.DATE32:
        return _add_months_days(datev.value.astype(jnp.int64),
                                months).astype(jnp.int32)
    ms = datev.value
    day_part = ms // MS_PER_DAY
    time_part = ms - day_part * MS_PER_DAY
    return _add_months_days(day_part, months) * MS_PER_DAY + time_part


for _dt_ in DATE_TYPES:
    for _it in [dt.int32, dt.int64]:
        _R.register("add_months", [_dt_, _it], _dt_, _add_months)


def _months_between(ctx, args):
    ms1, ms2 = _to_millis(args[0]), _to_millis(args[1])
    d1, d2 = ms1 // MS_PER_DAY, ms2 // MS_PER_DAY
    y1, m1, dd1 = civil_from_days(d1)
    y2, m2, dd2 = civil_from_days(d2)
    months = (y1 - y2) * 12 + (m1 - m2)
    last1 = dd1 == days_in_month(y1, m1)
    last2 = dd2 == days_in_month(y2, m2)
    both_last = last1 & last2
    t1 = ms1 - d1 * MS_PER_DAY
    t2 = ms2 - d2 * MS_PER_DAY
    frac = ((dd1 - dd2).astype(jnp.float64)
            + (t1 - t2).astype(jnp.float64) / MS_PER_DAY) / 31.0
    return jnp.where(both_last, months.astype(jnp.float64),
                     months.astype(jnp.float64) + frac)


for _dt_ in [dt.date64, dt.timestamp]:
    _R.register("months_between", [_dt_, _dt_], dt.float64, _months_between)


def _last_day(ctx, args):
    days = _to_days(args[0])
    y, m, _ = civil_from_days(days)
    out_days = days_from_civil(y, m, days_in_month(y, m))
    if args[0].dtype.kind is dt.TypeKind.DATE32:
        return out_days.astype(jnp.int32)
    return out_days * MS_PER_DAY


for _dt_ in DATE_TYPES:
    _R.register("last_day", [_dt_], _dt_, _last_day)


# ---------------------------------------------------------------------------
# timestampadd* / timestampdiff*
# ---------------------------------------------------------------------------

_FIXED_UNITS_MS = {
    "Second": MS_PER_SECOND, "Minute": MS_PER_MINUTE, "Hour": MS_PER_HOUR,
    "Day": MS_PER_DAY, "Week": 7 * MS_PER_DAY,
}

for _unit, _ms_ in _FIXED_UNITS_MS.items():
    def _addimpl(ctx, args, _ms_=_ms_):
        n, ts = args
        return ts.value + n.value.astype(jnp.int64) * _ms_

    def _diffimpl(ctx, args, _ms_=_ms_):
        # gandiva: timestampdiffX(t1, t2) = (t2 - t1) / unit, truncated
        t1, t2 = args
        diff = t2.value - t1.value
        return jnp.sign(diff) * (jnp.abs(diff) // _ms_)

    for _it in [dt.int32, dt.int64]:
        _R.register(f"timestampadd{_unit}", [_it, dt.timestamp], dt.timestamp,
                    _addimpl)
    _R.register(f"timestampdiff{_unit}", [dt.timestamp, dt.timestamp],
                dt.int64, _diffimpl)

for _unit, _mcount in [("Month", 1), ("Quarter", 3), ("Year", 12)]:
    def _addimpl(ctx, args, _mcount=_mcount):
        n, ts = args
        months = n.value.astype(jnp.int64) * _mcount
        ms = ts.value
        day_part = ms // MS_PER_DAY
        time_part = ms - day_part * MS_PER_DAY
        return _add_months_days(day_part, months) * MS_PER_DAY + time_part

    def _diffimpl(ctx, args, _mcount=_mcount):
        t1, t2 = args
        d1, d2 = t1.value // MS_PER_DAY, t2.value // MS_PER_DAY
        y1, m1, dd1 = civil_from_days(d1)
        y2, m2, dd2 = civil_from_days(d2)
        months = (y2 - y1) * 12 + (m2 - m1)
        # truncate toward zero on partial months
        tm1 = t1.value - d1 * MS_PER_DAY
        tm2 = t2.value - d2 * MS_PER_DAY
        partial1 = dd1 * MS_PER_DAY + tm1
        partial2 = dd2 * MS_PER_DAY + tm2
        adj = jnp.where((months > 0) & (partial2 < partial1), -1,
                        jnp.where((months < 0) & (partial2 > partial1), 1, 0))
        return (months + adj) // _mcount

    for _it in [dt.int32, dt.int64]:
        _R.register(f"timestampadd{_unit}", [_it, dt.timestamp], dt.timestamp,
                    _addimpl)
    _R.register(f"timestampdiff{_unit}", [dt.timestamp, dt.timestamp],
                dt.int64, _diffimpl)


# ---------------------------------------------------------------------------
# unix epoch conversions
# ---------------------------------------------------------------------------

_R.register("unix_timestamp", [dt.timestamp], dt.int64,
            lambda ctx, args: args[0].value // MS_PER_SECOND)
_R.register("from_unixtime", [dt.int64], dt.timestamp,
            lambda ctx, args: args[0].value * MS_PER_SECOND)
_R.register("from_unixtime", [dt.int32], dt.timestamp,
            lambda ctx, args: args[0].value.astype(jnp.int64) * MS_PER_SECOND)


def _next_day_impl(ctx, args):
    """next_day(date, dow_literal): first date after ``date`` that falls on
    the given weekday ('SU','MO',... or full names)."""
    datev, dowv = args
    if not dowv.is_literal:
        from .registry import ExpressionValidationError
        raise ExpressionValidationError("next_day requires a literal weekday")
    name = str(dowv.literal).upper()[:2]
    targets = {"SU": 1, "MO": 2, "TU": 3, "WE": 4, "TH": 5, "FR": 6, "SA": 7}
    if name not in targets:
        from .registry import ExpressionValidationError
        raise ExpressionValidationError(f"invalid weekday {dowv.literal!r}")
    target = targets[name]
    days = _to_days(datev)
    cur = _extract_dow(days)
    delta = (target - cur) % 7
    delta = jnp.where(delta == 0, 7, delta)
    out = days + delta
    if datev.dtype.kind is dt.TypeKind.DATE32:
        return out.astype(jnp.int32)
    return out * MS_PER_DAY


for _dt_ in DATE_TYPES:
    _R.register("next_day", [_dt_, dt.string], _dt_, _next_day_impl)


# ---------------------------------------------------------------------------
# string → date/timestamp parsing (the ToDateHolder analogue,
# to_date_holder.cc: pattern compiled once at Make, applied per row — here
# applied per *distinct* dictionary value on host)
# ---------------------------------------------------------------------------

_SQL_TO_STRPTIME = [
    ("YYYY", "%Y"), ("YYY", "%Y"), ("YY", "%y"),
    ("MONTH", "%B"), ("MON", "%b"), ("MM", "%m"),
    ("DDD", "%j"), ("DD", "%d"),
    ("HH24", "%H"), ("HH12", "%I"), ("HH", "%H"),
    ("MI", "%M"), ("SS", "%S"),
]


def sql_format_to_strptime(fmt: str) -> str:
    """SQL date format (YYYY-MM-DD …) → strptime format."""
    out = []
    i = 0
    up = fmt.upper()
    while i < len(fmt):
        for token, repl in _SQL_TO_STRPTIME:
            if up.startswith(token, i):
                out.append(repl)
                i += len(token)
                break
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _parse_table(ctx, sval, fmt: str, unit_ms: bool):
    """Host tables: parsed epoch value + parse-ok flag per distinct."""
    import datetime as _dt

    from .string_ops import _dict_list, _pad_pow2

    strp = sql_format_to_strptime(fmt)
    dthunk = sval.dict_thunk

    def values_thunk(batch, _dt_=dthunk, _f=strp):
        d = _dict_list(_dt_(batch))
        out = np.zeros(len(d), dtype=np.int64)
        for i, v in enumerate(d):
            if v is None:
                continue
            try:
                t = _dt.datetime.strptime(v.strip(), _f)
                out[i] = int((t - _dt.datetime(1970, 1, 1)).total_seconds()
                             * 1000)
            except ValueError:
                out[i] = 0
        return _pad_pow2(out, 0)

    def ok_thunk(batch, _dt_=dthunk, _f=strp):
        d = _dict_list(_dt_(batch))
        out = np.zeros(len(d), dtype=bool)
        for i, v in enumerate(d):
            if v is None:
                continue
            try:
                _dt.datetime.strptime(v.strip(), _f)
                out[i] = True
            except ValueError:
                pass
        return _pad_pow2(out, False)

    tv = ctx.add_table(values_thunk, cache_on_dicts=True)
    tok = ctx.add_table(ok_thunk, cache_on_dicts=True)
    codes = jnp.clip(sval.value, 0, tv.shape[0] - 1)
    return tv[codes], tok[codes]


def _to_date_impl(ctx, args):
    """to_date(string, format[, suppress_errors]) → date64; unparseable →
    null (NULL_INTERNAL, matching the holder's suppress-errors mode)."""
    from .registry import ExpressionValidationError

    s = args[0]
    if s.dict_thunk is None:
        raise ExpressionValidationError("to_date requires a string column")
    if not args[1].is_literal:
        raise ExpressionValidationError("to_date format must be a literal")
    ms, ok = _parse_table(ctx, s, str(args[1].literal), unit_ms=True)
    days_ms = (ms // MS_PER_DAY) * MS_PER_DAY
    validity = ok if s.validity is None else (ok & s.validity)
    from .registry import Val
    return Val(days_ms, validity, dt.date64)


def _cast_date_from_string(ctx, args):
    """castDATE(utf8) — ISO YYYY-MM-DD."""
    from .registry import ExpressionValidationError, Val

    s = args[0]
    if s.dict_thunk is None:
        raise ExpressionValidationError("castDATE requires a string column")
    sv = Val(s.value, s.validity, s.dtype, dict_thunk=s.dict_thunk)
    ms, ok = _parse_table(ctx, sv, "YYYY-MM-DD", unit_ms=True)
    validity = ok if s.validity is None else (ok & s.validity)
    return Val(ms, validity, dt.date64)


def _cast_ts_from_string(ctx, args):
    from .registry import ExpressionValidationError, Val

    s = args[0]
    if s.dict_thunk is None:
        raise ExpressionValidationError(
            "castTIMESTAMP requires a string column")
    ms, ok = _parse_table(ctx, s, "YYYY-MM-DD HH24:MI:SS", unit_ms=True)
    ms2, ok2 = _parse_table(ctx, s, "YYYY-MM-DD", unit_ms=True)
    out = jnp.where(ok, ms, ms2)
    okc = ok | ok2
    validity = okc if s.validity is None else (okc & s.validity)
    return Val(out, validity, dt.timestamp)


def _is_date_impl(ctx, args):
    from .registry import ExpressionValidationError, Val

    s = args[0]
    if s.dict_thunk is None:
        raise ExpressionValidationError("is_date requires a string column")
    fmt = "YYYY-MM-DD" if len(args) < 2 or not args[1].is_literal \
        else str(args[1].literal)
    _, ok = _parse_table(ctx, s, fmt, unit_ms=True)
    if s.validity is not None:
        ok = ok & s.validity
    return Val(ok, None, dt.bool_)


from .registry import Nullability as _N  # noqa: E402

_R.register("to_date", [dt.string, dt.string], dt.date64, _to_date_impl,
            nullability=_N.NULL_INTERNAL)
_R.register("to_date", [dt.string, dt.string, dt.int32], dt.date64,
            _to_date_impl, nullability=_N.NULL_INTERNAL)
_R.register("castDATE", [dt.string], dt.date64, _cast_date_from_string,
            nullability=_N.NULL_INTERNAL)
_R.register("castTIMESTAMP", [dt.string], dt.timestamp, _cast_ts_from_string,
            nullability=_N.NULL_INTERNAL)
_R.register("is_date", [dt.string], dt.bool_, _is_date_impl,
            nullability=_N.NULL_NEVER)
_R.register("is_date", [dt.string, dt.string], dt.bool_, _is_date_impl,
            nullability=_N.NULL_NEVER)


# ---------------------------------------------------------------------------
# interval day/year (r4 — VERDICT r3 #7): casts, timestamp/date ± interval
# (gandiva function_registry_timestamp_arithmetic.cc: timestamp + interval
# operators; castNULLABLEINTERVALDAY/YEAR in function_registry_datetime.cc)
#
# Representation (dtypes.py): interval_day packs (days << 32) | millis in an
# int64 lane (both components non-negative in the packed form; negative
# intervals carry sign on the days field via two's complement of the whole
# int64 when constructed from total millis); interval_year is months int32.
# ---------------------------------------------------------------------------

_M32 = jnp.int64(0xFFFF_FFFF)


def _interval_day_total_ms(v):
    """Packed interval_day -> total milliseconds (int64)."""
    days = v >> 32
    millis = v & _M32
    return days * MS_PER_DAY + millis


def _cast_interval_day(ctx, args):
    # gandiva castNULLABLEINTERVALDAY(int): the integer is total millis
    ms = args[0].value.astype(jnp.int64)
    days = ms // MS_PER_DAY
    rem = ms - days * MS_PER_DAY
    return (days << 32) | rem


def _cast_interval_year(ctx, args):
    # months
    return args[0].value.astype(jnp.int32)


for _it in (dt.int32, dt.int64):
    _R.register("castINTERVALDAY", [_it], dt.interval_day,
                _cast_interval_day, aliases=["castNULLABLEINTERVALDAY"])
    _R.register("castINTERVALYEAR", [_it], dt.interval_year,
                _cast_interval_year, aliases=["castNULLABLEINTERVALYEAR"])


def _ts_plus_interval_day(ctx, args):
    a, b = args
    if a.dtype.kind is dt.TypeKind.INTERVAL_DAY:
        b, a = a, b
    return a.value + _interval_day_total_ms(b.value.astype(jnp.int64))


def _ts_minus_interval_day(ctx, args):
    ts, iv = args
    return ts.value - _interval_day_total_ms(iv.value.astype(jnp.int64))


def _ts_plus_months(ts_ms, months):
    day_part = ts_ms // MS_PER_DAY
    time_part = ts_ms - day_part * MS_PER_DAY
    return _add_months_days(day_part, months) * MS_PER_DAY + time_part


def _ts_plus_interval_year(ctx, args):
    a, b = args
    if a.dtype.kind is dt.TypeKind.INTERVAL_YEAR:
        b, a = a, b
    return _ts_plus_months(a.value.astype(jnp.int64),
                           b.value.astype(jnp.int64))


def _ts_minus_interval_year(ctx, args):
    ts, iv = args
    return _ts_plus_months(ts.value.astype(jnp.int64),
                           -iv.value.astype(jnp.int64))


for _tt in (dt.timestamp, dt.date64):
    _R.register("add", [_tt, dt.interval_day], _tt, _ts_plus_interval_day,
                aliases=["date_add"])
    _R.register("add", [dt.interval_day, _tt], _tt, _ts_plus_interval_day)
    _R.register("subtract", [_tt, dt.interval_day], _tt,
                _ts_minus_interval_day, aliases=["date_sub"])
    _R.register("add", [_tt, dt.interval_year], _tt, _ts_plus_interval_year)
    _R.register("add", [dt.interval_year, _tt], _tt, _ts_plus_interval_year)
    _R.register("subtract", [_tt, dt.interval_year], _tt,
                _ts_minus_interval_year)


def _date32_plus_interval_day(ctx, args):
    a, b = args
    if a.dtype.kind is dt.TypeKind.INTERVAL_DAY:
        b, a = a, b
    iv = b.value.astype(jnp.int64)
    return (a.value.astype(jnp.int64) + (iv >> 32)).astype(jnp.int32)


_R.register("add", [dt.date32, dt.interval_day], dt.date32,
            _date32_plus_interval_day)
_R.register("add", [dt.interval_day, dt.date32], dt.date32,
            _date32_plus_interval_day)


# ---------------------------------------------------------------------------
# interval extraction + interval → integer casts (r5 — VERDICT r4 #8;
# gandiva precompiled/time.cc extractDay_daytimeinterval,
# function_registry_datetime.cc castBIGINT(day_time_interval) /
# castINT(month_interval))
# ---------------------------------------------------------------------------

def _extract_day_interval(ctx, args):
    # the days component of the packed (days << 32) | millis lane
    return (args[0].value.astype(jnp.int64) >> 32)


def _cast_bigint_interval_day(ctx, args):
    # total milliseconds (the inverse of castINTERVALDAY(int))
    return _interval_day_total_ms(args[0].value.astype(jnp.int64))


def _cast_int_interval_year(ctx, args):
    # months
    return args[0].value.astype(jnp.int32)


_R.register("extractDay", [dt.interval_day], dt.int64,
            _extract_day_interval)
_R.register("castBIGINT", [dt.interval_day], dt.int64,
            _cast_bigint_interval_day)
_R.register("castINT", [dt.interval_year], dt.int32,
            _cast_int_interval_year)
_R.register("castBIGINT", [dt.interval_year], dt.int64,
            lambda ctx, args: args[0].value.astype(jnp.int64))
