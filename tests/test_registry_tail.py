"""Registry tail (r5 — VERDICT r4 #8): interval extraction fns,
castVARBINARY family, unsigned-value aggregate encodings."""
import numpy as np
import pyarrow as pa
import pytest

import jax.numpy as jnp

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.ops.hash_aggregate import hash_aggregate

B = g.TreeExprBuilder


def _eval_scalar(fn_name, arg_node, arg_field, out_t, batch):
    schema = dt.Schema([arg_field])
    node = B.make_function(fn_name, [arg_node], out_t)
    expr = B.make_expression(node, dt.Field("out", out_t))
    proj = g.make_projector(schema, [expr], use_cache=False)
    (r,) = proj.evaluate(batch)
    return r


def test_interval_extraction_and_casts():
    f = dt.Field("iv", dt.interval_day)
    # packed (days << 32) | millis
    days, millis = np.int64(5), np.int64(7_200_000)  # 5 days 2 hours
    packed = (days << 32) | millis
    batch = pa.RecordBatch.from_arrays(
        [pa.array([int(packed)], type=pa.int64())], names=["iv"])
    # the batch carries the packed lane as int64; rebuild with the engine's
    # Batch API to tag it interval_day
    from gandiva_tpu.batch import Batch, Column
    col = Column(jnp.asarray(np.array([packed])),
                 jnp.ones(1, bool), dt.interval_day)
    b = Batch({"iv": col}, 1)

    r = _eval_scalar("extractDay", B.make_field(f), f, dt.int64, b)
    assert r.to_pylist() == [5]
    r = _eval_scalar("castBIGINT", B.make_field(f), f, dt.int64, b)
    assert r.to_pylist() == [5 * 86_400_000 + 7_200_000]

    fy = dt.Field("iy", dt.interval_year)
    coly = Column(jnp.asarray(np.array([27], np.int32)),
                  jnp.ones(1, bool), dt.interval_year)
    by = Batch({"iy": coly}, 1)
    r = _eval_scalar("castINT", B.make_field(fy), fy, dt.int32, by)
    assert r.to_pylist() == [27]
    r = _eval_scalar("castBIGINT", B.make_field(fy), fy, dt.int64, by)
    assert r.to_pylist() == [27]


def test_interval_tail_signatures_enumerated():
    names = {(s.name, tuple(str(t) for t in s.param_types))
             for s in g.get_registered_function_signatures()}
    assert ("extractDay", ("interval_day",)) in names
    assert ("castBIGINT", ("interval_day",)) in names
    assert ("castINT", ("interval_year",)) in names
    assert any(s.name == "castVARBINARY"
               for s in g.get_registered_function_signatures())


def test_cast_varbinary_string():
    f = dt.Field("s", dt.string)
    schema = dt.Schema([f])
    node = B.make_function(
        "castVARBINARY", [B.make_field(f), B.make_int64_literal(3)],
        dt.binary)
    expr = B.make_expression(node, dt.Field("out", dt.binary))
    proj = g.make_projector(schema, [expr], use_cache=False)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(["hello", "ab", None, "worlds"])], names=["s"])
    (r,) = proj.evaluate(batch)
    assert r.to_pylist() == [b"hel", b"ab", None, b"wor"]
    # maxlen 0 = unlimited (gandiva contract)
    node0 = B.make_function(
        "castVARBINARY", [B.make_field(f), B.make_int64_literal(0)],
        dt.binary)
    proj0 = g.make_projector(
        schema, [B.make_expression(node0, dt.Field("out", dt.binary))],
        use_cache=False)
    (r0,) = proj0.evaluate(batch)
    assert r0.to_pylist() == [b"hello", b"ab", None, b"worlds"]


def test_cast_varbinary_numeric():
    f = dt.Field("x", dt.int64)
    schema = dt.Schema([f])
    node = B.make_function(
        "castVARBINARY", [B.make_field(f), B.make_int64_literal(64)],
        dt.binary)
    expr = B.make_expression(node, dt.Field("out", dt.binary))
    proj = g.make_projector(schema, [expr], use_cache=False)
    batch = pa.RecordBatch.from_arrays(
        [pa.array([123, -45, None], type=pa.int64())], names=["x"])
    (r,) = proj.evaluate(batch)
    assert r.to_pylist() == [b"123", b"-45", None]


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint32, np.uint64])
def test_unsigned_aggregates(backend, dtype):
    rng = np.random.default_rng(5)
    n = 8192
    keys = rng.integers(0, 16, n)
    hi = np.iinfo(dtype).max
    vals = rng.integers(0, hi, n, dtype=dtype)
    # sprinkle boundary values incl. > int64 range for u64
    vals[:4] = [0, hi, hi - 1, 1]
    res = hash_aggregate(
        jnp.asarray(keys), [("v", "sum"), ("v", "min"), ("v", "max"),
                            ("v", "count")],
        {"v": (jnp.asarray(vals), None)}, max_groups=32, backend=backend)
    assert not bool(res["overflow"])
    cnt = int(res["group_count"])
    got_keys = np.asarray(res["keys"])[:cnt]
    sums = np.asarray(res["agg:v:sum"])[:cnt]
    mins = np.asarray(res["agg:v:min"])[:cnt]
    maxs = np.asarray(res["agg:v:max"])[:cnt]
    assert sums.dtype == np.uint64
    assert mins.dtype == dtype and maxs.dtype == dtype
    for i, k in enumerate(got_keys.tolist()):
        sel = vals[keys == k]
        assert int(sums[i]) == int(np.sum(sel.astype(object))) % (1 << 64), k
        assert int(mins[i]) == int(sel.min()), k
        assert int(maxs[i]) == int(sel.max()), k
