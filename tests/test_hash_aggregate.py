"""Hash aggregate tests — differential vs pyarrow (Acero oracle)."""
import numpy as np
import pyarrow as pa
import pytest

import jax.numpy as jnp

from gandiva_tpu.ops.groupby import group_ids
from gandiva_tpu.ops.hash_aggregate import hash_aggregate


def _oracle_agg(keys, vals, key_null=None, val_null=None):
    """pyarrow groupby oracle returning dict key→(sum, count, min, max)."""
    k = pa.array(keys, mask=key_null)
    v = pa.array(vals, mask=val_null)
    t = pa.table({"k": k, "v": v})
    res = t.group_by("k").aggregate(
        [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")])
    out = {}
    for row in res.to_pylist():
        out[row["k"]] = (row["v_sum"], row["v_count"], row["v_min"],
                         row["v_max"])
    return out


def test_group_ids_basic():
    keys = jnp.asarray(np.array([5, 3, 5, 7, 3, 3, 9], dtype=np.int64))
    gid, uniq, count, overflow = group_ids(keys, max_groups=16)
    gid = np.asarray(gid)
    assert int(count) == 4
    assert not bool(overflow)
    # same key ⇒ same id; different ⇒ different
    assert gid[0] == gid[2]
    assert gid[1] == gid[4] == gid[5]
    assert len({gid[0], gid[1], gid[3], gid[6]}) == 4
    uniq = np.asarray(uniq)[:4]
    assert set(uniq.tolist()) == {5, 3, 7, 9}
    # uniq[gid] reconstructs keys
    np.testing.assert_array_equal(np.asarray(uniq)[gid], np.asarray(keys))


def test_group_ids_overflow():
    keys = jnp.asarray(np.arange(100, dtype=np.int64))
    gid, uniq, count, overflow = group_ids(keys, max_groups=8,
                                           table_factor=1)
    # 100 distinct keys into an 8-slot table must overflow
    assert bool(overflow)


def test_group_ids_many_collisions():
    # keys engineered to collide: multiples of table size
    T = 64
    keys = jnp.asarray((np.arange(32, dtype=np.int64) * 1) % 16)
    gid, uniq, count, overflow = group_ids(keys, max_groups=16)
    assert int(count) == 16
    assert not bool(overflow)


@pytest.mark.parametrize("nulls", [False, True])
@pytest.mark.parametrize("backend", ["auto", "pallas_interpret"])
def test_hash_aggregate_vs_arrow_int(nulls, backend):
    rng = np.random.default_rng(42)
    n = 5000
    keys = rng.integers(0, 64, size=n).astype(np.int64)
    vals = rng.integers(-100, 100, size=n).astype(np.int64)
    key_null = (rng.random(n) < 0.1) if nulls else None
    val_null = (rng.random(n) < 0.1) if nulls else None

    res = hash_aggregate(
        jnp.asarray(keys),
        [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")],
        {"v": (jnp.asarray(vals),
               None if val_null is None else jnp.asarray(~val_null))},
        key_valid=None if key_null is None else jnp.asarray(~key_null),
        max_groups=128, backend=backend)
    assert not bool(res["overflow"])
    gcount = int(res["group_count"])
    got_keys = np.asarray(res["keys"])[:gcount]
    null_flags = np.asarray(res["key_is_null"])[:gcount]
    sums = np.asarray(res["agg:v:sum"])[:gcount]
    counts = np.asarray(res["agg:v:count"])[:gcount]
    mins = np.asarray(res["agg:v:min"])[:gcount]
    maxs = np.asarray(res["agg:v:max"])[:gcount]

    oracle = _oracle_agg(keys, vals, key_null, val_null)
    assert gcount == len(oracle)
    for i in range(gcount):
        k = None if null_flags[i] else int(got_keys[i])
        osum, ocount, omin, omax = oracle[k]
        assert counts[i] == ocount, (k, counts[i], ocount)
        assert sums[i] == (osum if osum is not None else 0), k
        if ocount > 0:
            assert mins[i] == omin, k
            assert maxs[i] == omax, k


def test_hash_aggregate_float_sum_close():
    rng = np.random.default_rng(7)
    n = 20000
    keys = rng.integers(0, 16, size=n).astype(np.int64)
    vals = rng.random(n)
    res = hash_aggregate(jnp.asarray(keys), [("v", "sum"), ("v", "mean")],
                         {"v": (jnp.asarray(vals), None)}, max_groups=32)
    gcount = int(res["group_count"])
    got_keys = np.asarray(res["keys"])[:gcount]
    sums = np.asarray(res["agg:v:sum"])[:gcount]
    means = np.asarray(res["agg:v:mean"])[:gcount]
    for i, k in enumerate(got_keys):
        sel = vals[keys == k]
        np.testing.assert_allclose(sums[i], sel.sum(), rtol=1e-12)
        np.testing.assert_allclose(means[i], sel.mean(), rtol=1e-12)


def test_hash_aggregate_pallas_wide_values_and_kinds():
    """Pallas path: 64-bit magnitudes (limb carries), count_all, mean,
    int32 narrow min/max identities, null-key group — vs numpy oracle."""
    rng = np.random.default_rng(3)
    n = 4096
    keys = (rng.integers(-5, 6, n) * 10 ** 10).astype(np.int64)
    vals = rng.integers(-10 ** 12, 10 ** 12, n).astype(np.int64)
    v32 = rng.integers(-10 ** 6, 10 ** 6, n).astype(np.int32)
    key_null = rng.random(n) < 0.15
    val_null = rng.random(n) < 0.2

    res = hash_aggregate(
        jnp.asarray(keys),
        [("v", "sum"), ("v", "mean"), ("v", "count_all"),
         ("w", "min"), ("w", "max"), ("w", "count")],
        {"v": (jnp.asarray(vals), jnp.asarray(~val_null)),
         "w": (jnp.asarray(v32), None)},
        key_valid=jnp.asarray(~key_null),
        max_groups=64, backend="pallas_interpret")
    assert not bool(res["overflow"])
    gcount = int(res["group_count"])
    got_keys = np.asarray(res["keys"])[:gcount]
    nullf = np.asarray(res["key_is_null"])[:gcount]
    assert res["agg:w:min"].dtype == jnp.int32
    for i in range(gcount):
        if nullf[i]:
            rows = key_null
        else:
            rows = ~key_null & (keys == got_keys[i])
        vrows = rows & ~val_null
        assert np.asarray(res["agg:v:count_all"])[i] == rows.sum()
        assert np.asarray(res["agg:v:sum"])[i] == vals[vrows].sum()
        if vrows.any():
            np.testing.assert_allclose(
                np.asarray(res["agg:v:mean"])[i], vals[vrows].mean(),
                rtol=1e-12)
        assert np.asarray(res["agg:w:count"])[i] == rows.sum()
        assert np.asarray(res["agg:w:min"])[i] == v32[rows].min()
        assert np.asarray(res["agg:w:max"])[i] == v32[rows].max()
    assert nullf.sum() == 1  # exactly one null-key group


def test_hash_aggregate_pallas_overflow_flag():
    keys = jnp.asarray(np.arange(300, dtype=np.int64))
    vals = jnp.asarray(np.ones(300, dtype=np.int64))
    res = hash_aggregate(keys, [("v", "sum")], {"v": (vals, None)},
                         max_groups=64, backend="pallas_interpret")
    assert bool(res["overflow"])


def test_hash_aggregate_pallas_padding_unaligned():
    """n not a multiple of the kernel block: padded rows must not leak."""
    rng = np.random.default_rng(9)
    n = 1000  # pads to 1024
    keys = rng.integers(0, 7, n).astype(np.int64)
    vals = rng.integers(-50, 50, n).astype(np.int64)
    res = hash_aggregate(jnp.asarray(keys), [("v", "sum"), ("v", "count")],
                         {"v": (jnp.asarray(vals), None)},
                         max_groups=16, backend="pallas_interpret")
    gcount = int(res["group_count"])
    assert gcount == len(np.unique(keys))
    got_keys = np.asarray(res["keys"])[:gcount]
    for i, k in enumerate(got_keys):
        assert np.asarray(res["agg:v:sum"])[i] == vals[keys == k].sum()
        assert np.asarray(res["agg:v:count"])[i] == (keys == k).sum()


def test_hash_aggregate_traceable():
    import jax

    keys = jnp.asarray(np.array([1, 2, 1, 3], dtype=np.int64))
    vals = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0]))

    @jax.jit
    def f(k, v):
        return hash_aggregate(k, [("v", "sum")], {"v": (v, None)},
                              max_groups=8)

    res = f(keys, vals)
    assert int(res["group_count"]) == 3


def test_group_ids_float_keys_not_truncated():
    from gandiva_tpu.ops.groupby import group_ids

    keys = jnp.asarray(np.array([1.5, 1.7, 1.5, -0.0, 0.0, 2.0]))
    gid, uniq, count, ov = group_ids(keys, max_groups=16)
    gid = np.asarray(gid)
    assert int(count) == 4  # {1.5, 1.7, ±0.0, 2.0}
    assert gid[0] == gid[2]
    assert gid[0] != gid[1]
    assert gid[3] == gid[4]  # -0.0 == 0.0


def test_group_ids_multi_with_nulls():
    from gandiva_tpu.ops.groupby import group_ids_multi

    rng = np.random.default_rng(1)
    n = 2000
    k1 = rng.integers(0, 10, n).astype(np.int64)
    k2 = rng.integers(0, 8, n).astype(np.int64)
    null2 = rng.random(n) < 0.2
    gid, gcount, ov = group_ids_multi(
        [jnp.asarray(k1), jnp.asarray(k2)],
        valids=[None, jnp.asarray(~null2)], max_groups=256)
    assert not bool(ov)
    gid = np.asarray(gid)
    m = {}
    for i in range(n):
        t = (k1[i], None if null2[i] else k2[i])
        if t in m:
            assert m[t] == gid[i]
        else:
            m[t] = gid[i]
    assert int(gcount) == len(m)


# ---------------------------------------------------------------------------
# r4 tiers: float values + >128 groups in the Pallas kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_pallas_float_values_vs_acero(dtype):
    rng = np.random.default_rng(11)
    n = 20_000
    keys = rng.integers(0, 48, n)
    vals = (rng.random(n) * 1000 - 200).astype(dtype)
    res = hash_aggregate(
        jnp.asarray(keys), [("v", "sum"), ("v", "count"), ("v", "min"),
                            ("v", "max"), ("v", "mean")],
        {"v": (jnp.asarray(vals), None)},
        max_groups=64, backend="pallas_interpret")
    assert not bool(res["overflow"])
    cnt = int(res["group_count"])
    got_keys = np.asarray(res["keys"])[:cnt]
    oracle = _oracle_agg(keys, vals)
    assert set(got_keys.tolist()) == set(oracle)
    for i, k in enumerate(got_keys.tolist()):
        s, c, mn, mx = oracle[k]
        # float sums are order-dependent everywhere (Arrow included);
        # the kernel's compensated plane sums are f64-class across blocks
        np.testing.assert_allclose(float(np.asarray(res["agg:v:sum"])[i]),
                                   s, rtol=2e-5)
        assert int(np.asarray(res["agg:v:count"])[i]) == c
        # f64 rides the TPU's native double-float (hi,lo f32) planes:
        # ~49-bit mantissa, so the 53-bit CPU oracle differs in the last
        # ulps; f32 planes are lossless
        mmtol = 0 if dtype == np.float32 else 1e-13
        np.testing.assert_allclose(float(np.asarray(res["agg:v:min"])[i]),
                                   mn, rtol=mmtol)
        np.testing.assert_allclose(float(np.asarray(res["agg:v:max"])[i]),
                                   mx, rtol=mmtol)
        np.testing.assert_allclose(float(np.asarray(res["agg:v:mean"])[i]),
                                   s / c, rtol=2e-5)


def test_pallas_float_nulls_and_null_keys():
    rng = np.random.default_rng(12)
    n = 8_000
    keys = rng.integers(0, 10, n)
    key_null = rng.random(n) < 0.1
    vals = (rng.random(n) * 100).astype(np.float64)
    val_null = rng.random(n) < 0.2
    res = hash_aggregate(
        jnp.asarray(keys), [("v", "sum"), ("v", "count"), ("v", "min")],
        {"v": (jnp.asarray(vals), jnp.asarray(~val_null))},
        key_valid=jnp.asarray(~key_null),
        max_groups=16, backend="pallas_interpret")
    cnt = int(res["group_count"])
    oracle = _oracle_agg(keys, vals, key_null=key_null, val_null=val_null)
    got_keys = np.asarray(res["keys"])[:cnt]
    nullmask = np.asarray(res["key_is_null"])[:cnt]
    for i in range(cnt):
        k = None if nullmask[i] else int(got_keys[i])
        s, c, mn, mx = oracle[k]
        assert int(np.asarray(res["agg:v:count"])[i]) == c
        if c:
            np.testing.assert_allclose(
                float(np.asarray(res["agg:v:sum"])[i]), s, rtol=1e-6)
            np.testing.assert_allclose(
                float(np.asarray(res["agg:v:min"])[i]), mn, rtol=1e-13)


def test_pallas_512_groups_vs_acero():
    rng = np.random.default_rng(13)
    n = 60_000
    keys = rng.integers(0, 500, n)
    vals = rng.integers(-10**9, 10**9, n)
    res = hash_aggregate(
        jnp.asarray(keys), [("v", "sum"), ("v", "count"), ("v", "max")],
        {"v": (jnp.asarray(vals), None)},
        max_groups=512, backend="pallas_interpret")
    assert not bool(res["overflow"])
    cnt = int(res["group_count"])
    assert cnt == len(set(keys.tolist()))
    oracle = _oracle_agg(keys, vals)
    got_keys = np.asarray(res["keys"])[:cnt]
    sums = np.asarray(res["agg:v:sum"])[:cnt]
    maxs = np.asarray(res["agg:v:max"])[:cnt]
    for i, k in enumerate(got_keys.tolist()):
        s, c, mn, mx = oracle[k]
        assert int(sums[i]) == s
        assert int(maxs[i]) == mx


def test_pallas_f64_out_of_f32_range_sets_overflow():
    """ADVICE r4 high: the f64 Pallas tier rides (hi, lo) f32 planes, so
    legal f64 values beyond f32 range (or below the f32 normal floor, which
    TPU flushes to zero) silently corrupt sums. The range guard must flag
    such batches through the overflow flag so callers retry on the exact
    XLA path."""
    keys = np.zeros(2048, dtype=np.int64)
    for bad in (1e300, 1e-45, np.inf):
        vals = np.full(2048, bad, dtype=np.float64)
        res = hash_aggregate(
            jnp.asarray(keys), [("v", "sum"), ("v", "min")],
            {"v": (jnp.asarray(vals), None)},
            max_groups=8, backend="pallas_interpret")
        assert bool(res["overflow"]), f"value {bad} not flagged"
        # the XLA fallback the flag directs callers to is exact
        res2 = hash_aggregate(
            jnp.asarray(keys), [("v", "sum"), ("v", "min")],
            {"v": (jnp.asarray(vals), None)},
            max_groups=8, backend="xla")
        assert not bool(res2["overflow"])
        got = float(np.asarray(res2["agg:v:sum"])[0])
        np.testing.assert_allclose(got, float(np.sum(vals)), rtol=1e-12)
    # in-range values stay unflagged (no false positives)
    vals = np.linspace(-1e30, 1e30, 2048)
    res = hash_aggregate(
        jnp.asarray(keys), [("v", "sum")], {"v": (jnp.asarray(vals), None)},
        max_groups=8, backend="pallas_interpret")
    assert not bool(res["overflow"])
    # exact zero is fine (the underflow test is (x != 0) & small)
    vals = np.zeros(2048)
    res = hash_aggregate(
        jnp.asarray(keys), [("v", "sum")], {"v": (jnp.asarray(vals), None)},
        max_groups=8, backend="pallas_interpret")
    assert not bool(res["overflow"])
