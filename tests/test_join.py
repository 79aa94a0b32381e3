"""Join tests — differential vs pyarrow join oracle (all six types,
duplicates, nulls, skew)."""
import numpy as np
import pyarrow as pa
import pytest

import jax.numpy as jnp

from gandiva_tpu.ops.hash_join import JoinResult, gather_payload, join


def _oracle(probe_k, build_k, how, probe_null=None, build_null=None):
    pt = pa.table({"k": pa.array(probe_k, mask=probe_null),
                   "pv": pa.array(np.arange(len(probe_k)))})
    bt = pa.table({"k": pa.array(build_k, mask=build_null),
                   "bv": pa.array(np.arange(len(build_k)))})
    how_map = {"inner": "inner", "left": "left outer",
               "right": "right outer", "full": "full outer",
               "semi": "left semi", "anti": "left anti"}
    res = pt.join(bt, keys="k", join_type=how_map[how],
                  coalesce_keys=False).to_pylist()
    if how in ("semi", "anti"):
        return sorted(r["pv"] for r in res)
    return sorted((r["pv"] if r["pv"] is not None else -1,
                   r["bv"] if r["bv"] is not None else -1) for r in res)


def _ours(probe_k, build_k, how, capacity, probe_null=None, build_null=None):
    res = join(jnp.asarray(probe_k), jnp.asarray(build_k), capacity, how,
               probe_valid=None if probe_null is None
               else jnp.asarray(~probe_null),
               build_valid=None if build_null is None
               else jnp.asarray(~build_null))
    assert not bool(res.overflow), "capacity overflow"
    n = int(res.count)
    p = np.asarray(res.probe_idx)[:n]
    b = np.asarray(res.build_idx)[:n]
    if how in ("semi", "anti"):
        return sorted(int(x) for x in p)
    return sorted(((int(x) if x >= 0 else -1, int(y) if y >= 0 else -1)
                   for x, y in zip(p, b)))


@pytest.mark.parametrize("how", ["inner", "left", "right", "full", "semi",
                                 "anti"])
def test_join_small_with_duplicates(how):
    probe = np.array([1, 2, 3, 2, 7, 1], dtype=np.int64)
    build = np.array([2, 2, 1, 9], dtype=np.int64)
    ours = _ours(probe, build, how, 64)
    oracle = _oracle(probe, build, how)
    if how in ("semi", "anti"):
        assert ours == oracle
    else:
        assert ours == oracle


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti", "full"])
def test_join_nulls_never_match(how):
    probe = np.array([1, 0, 2, 0], dtype=np.int64)
    probe_null = np.array([False, True, False, True])
    build = np.array([1, 0], dtype=np.int64)
    build_null = np.array([False, True])
    ours = _ours(probe, build, how, 64, probe_null, build_null)
    oracle = _oracle(probe, build, how, probe_null, build_null)
    if how in ("semi", "anti"):
        assert ours == oracle
    else:
        assert ours == oracle


def test_join_random_differential():
    rng = np.random.default_rng(42)
    probe = rng.integers(0, 500, size=3000).astype(np.int64)
    build = rng.integers(0, 700, size=400).astype(np.int64)
    for how in ["inner", "left", "right", "full", "semi", "anti"]:
        ours = _ours(probe, build, how, 8192)
        oracle = _oracle(probe, build, how)
        if how in ("semi", "anti"):
            assert ours == oracle, how
        else:
            assert ours == oracle, how


def test_join_skewed_zipf():
    rng = np.random.default_rng(3)
    probe = (rng.zipf(1.5, size=5000) % 100).astype(np.int64)
    build = np.arange(50, dtype=np.int64)
    ours = _ours(probe, build, "inner", 8192)
    oracle = _oracle(probe, build, "inner")
    assert ours == sorted(oracle)


def test_join_overflow_flag():
    probe = np.zeros(100, dtype=np.int64)
    build = np.zeros(100, dtype=np.int64)  # 100×100 = 10000 pairs
    res = join(jnp.asarray(probe), jnp.asarray(build), 512, "inner")
    assert bool(res.overflow)


def test_gather_payload():
    probe = np.array([1, 2, 9], dtype=np.int64)
    build = np.array([2, 1], dtype=np.int64)
    pv = np.array([10.0, 20.0, 90.0])
    bv = np.array([200.0, 100.0])
    res = join(jnp.asarray(probe), jnp.asarray(build), 16, "left")
    cols, row_ok = gather_payload(
        res, probe_cols={"pv": (jnp.asarray(pv), None)},
        build_cols={"bv": (jnp.asarray(bv), None)})
    n = int(res.count)
    got = sorted(
        (float(np.asarray(cols["pv"][0])[i]),
         float(np.asarray(cols["bv"][0])[i])
         if bool(np.asarray(cols["bv"][1])[i]) else None)
        for i in range(n))
    assert got == [(10.0, 100.0), (20.0, 200.0), (90.0, None)]


@pytest.mark.parametrize("how", ["inner", "left", "right", "full",
                                 "semi", "anti"])
def test_join_multi_key(how):
    from gandiva_tpu.ops.hash_join import join_multi

    rng = np.random.default_rng(9)
    n, m = 800, 200
    p1 = rng.integers(0, 40, n).astype(np.int64)
    p2 = rng.integers(0, 5, n).astype(np.int64)
    b1 = rng.integers(0, 50, m).astype(np.int64)
    b2 = rng.integers(0, 5, m).astype(np.int64)

    res = join_multi([jnp.asarray(p1), jnp.asarray(p2)],
                     [jnp.asarray(b1), jnp.asarray(b2)], 16384, how)
    assert not bool(res.overflow)
    c = int(res.count)
    pi = np.asarray(res.probe_idx)[:c]
    bi = np.asarray(res.build_idx)[:c]

    pt = pa.table({"k1": p1, "k2": p2, "pv": np.arange(n)})
    bt = pa.table({"k1": b1, "k2": b2, "bv": np.arange(m)})
    how_map = {"inner": "inner", "left": "left outer",
               "right": "right outer", "full": "full outer",
               "semi": "left semi", "anti": "left anti"}
    ores = pt.join(bt, keys=["k1", "k2"], join_type=how_map[how],
                   coalesce_keys=False).to_pylist()
    if how in ("semi", "anti"):
        got = sorted(int(x) for x in pi)
        expect = sorted(r["pv"] for r in ores)
    else:
        got = sorted((int(a), int(b)) for a, b in zip(pi, bi))
        expect = sorted((r["pv"] if r["pv"] is not None else -1,
                         r["bv"] if r["bv"] is not None else -1)
                        for r in ores)
    assert got == expect, how


def test_join_heavy_duplicate_runs():
    """Dup-key stress for the hash-range probe: few distinct keys, long
    duplicate runs on BOTH sides, differential vs pyarrow inner join."""
    rng = np.random.default_rng(21)
    n, m = 4000, 600
    probe = rng.integers(0, 12, n).astype(np.int64)
    build = rng.integers(0, 12, m).astype(np.int64)
    res = join(jnp.asarray(probe), jnp.asarray(build), 512 * 1024, "inner")
    assert not bool(res.overflow)
    c = int(res.count)
    got = sorted((int(a), int(b))
                 for a, b in zip(np.asarray(res.probe_idx)[:c],
                                 np.asarray(res.build_idx)[:c]))
    pt = pa.table({"k": probe, "pv": np.arange(n)})
    bt = pa.table({"k": build, "bv": np.arange(m)})
    expect = sorted((r["pv"], r["bv"])
                    for r in pt.join(bt, keys=["k"], join_type="inner",
                                     coalesce_keys=False).to_pylist())
    assert got == expect


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_join_unique_build_fast_path(how):
    from gandiva_tpu.ops.hash_join import join as _join

    rng = np.random.default_rng(13)
    n, m = 3000, 400
    probe = rng.integers(0, 800, n).astype(np.int64)
    build = rng.permutation(800)[:m].astype(np.int64)  # unique
    res = _join(jnp.asarray(probe), jnp.asarray(build), n, how,
                build_unique=True)
    assert not bool(res.overflow)
    c = int(res.count)
    got_pairs = [(int(a), int(b))
                 for a, b in zip(np.asarray(res.probe_idx)[:c],
                                 np.asarray(res.build_idx)[:c])]
    ref = _join(jnp.asarray(probe), jnp.asarray(build), 4 * n, how)
    rc = int(ref.count)
    ref_pairs = [(int(a), int(b))
                 for a, b in zip(np.asarray(ref.probe_idx)[:rc],
                                 np.asarray(ref.build_idx)[:rc])]
    assert sorted(got_pairs) == sorted(ref_pairs), how


def test_join_unique_build_detects_duplicates():
    from gandiva_tpu.ops.hash_join import join as _join

    probe = np.array([1, 2], dtype=np.int64)
    build = np.array([1, 1, 2], dtype=np.int64)  # NOT unique
    res = _join(jnp.asarray(probe), jnp.asarray(build), 16, "inner",
                build_unique=True)
    assert bool(res.overflow)


def test_join_stream_matches_monolithic():
    """Build-once/probe-many (r5): streaming chunks give exactly the
    monolithic join's pairs (modulo chunk-local probe indexing)."""
    import jax
    from gandiva_tpu.ops.hash_join import join, join_stream

    rng = np.random.default_rng(17)
    nb, K, n = 1000, 4, 2048
    build = jnp.asarray(rng.integers(0, 1500, nb))
    probe = rng.integers(0, 1500, K * n)
    stacked = jnp.asarray(probe.reshape(K, n))

    run = join_stream(build, K, probe_stacked=stacked, capacity=8 * n,
                      how="inner")
    outs, ovf = jax.jit(run)()
    assert not bool(ovf)
    got = []
    for i in range(K):
        cnt = int(outs.count[i])
        for j in range(cnt):
            got.append((i * n + int(outs.probe_idx[i][j]),
                        int(outs.build_idx[i][j])))

    mono = join(jnp.asarray(probe), build, capacity=8 * K * n, how="inner")
    exp = [(int(mono.probe_idx[j]), int(mono.build_idx[j]))
           for j in range(int(mono.count))]
    assert sorted(got) == sorted(exp)


def test_join_stream_chunk_fn_and_consume():
    """Generator-mode chunks + device-side consume (the 1B-scale shape)."""
    import jax
    from gandiva_tpu.ops.hash_join import join_stream

    nb, K, n = 512, 3, 1024
    build = jnp.arange(nb, dtype=jnp.int64)

    def chunk_fn(i):
        key = jax.random.fold_in(jax.random.PRNGKey(9), i)
        return jax.random.randint(key, (n,), 0, nb, dtype=jnp.int64)

    def consume(res):
        return (res.count.astype(jnp.int64)
                + jnp.sum(res.build_idx.astype(jnp.int64)))

    run = join_stream(build, K, chunk_fn=chunk_fn, capacity=n,
                      how="inner", consume=consume, build_unique=True)
    outs, ovf = jax.jit(run)()
    assert not bool(ovf)
    # oracle: regenerate the same chunks and sum keys (unique build ⇒
    # build_idx == key value)
    for i in range(K):
        key = jax.random.fold_in(jax.random.PRNGKey(9), i)
        ch = jax.random.randint(key, (n,), 0, nb, dtype=jnp.int64)
        assert int(outs[i]) == n + int(np.sum(np.asarray(ch)))


@pytest.mark.parametrize("dist", ["zipf", "uniform", "allsame"])
def test_probe_ranges_hot_matches_dense(dist):
    """r5 hot-key probe: identical (start, len) resolution to the dense
    path on skewed, uniform (capacity-overflow → fallback walk), and
    degenerate single-key probes."""
    from gandiva_tpu.ops.hash_join import (_build_ranges_table,
                                           _probe_ranges_dense,
                                           _probe_ranges_hot)
    from gandiva_tpu.ops.sort import SortKey, _sort_full, normalize_key

    rng = np.random.default_rng(23)
    nb = 4096
    np_ = 65536
    build = rng.integers(0, 3000, nb)     # duplicate runs included
    if dist == "zipf":
        probe = (rng.zipf(1.3, np_) % 3500).astype(np.int64)
    elif dist == "uniform":
        probe = rng.integers(0, 3500, np_)   # ~no hot keys -> overflow
    else:
        probe = np.full(np_, 7, dtype=np.int64)
    bk = jnp.asarray(build)
    pk_raw = jnp.asarray(probe)

    kv = jnp.ones((nb,), bool)
    perm, (sorted_keys,), _ = _sort_full(
        [SortKey(bk, validity=kv, nulls_first=False)], None)
    table, uniq = _build_ranges_table(sorted_keys, jnp.int32(nb), perm)
    pk = normalize_key(pk_raw)
    pkv = jnp.ones((np_,), bool)
    s1, l1, d1 = _probe_ranges_dense(table, nb, pk, pkv)
    s2, l2, d2 = _probe_ranges_hot(table, nb, pk, pkv, 128)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # some rows must actually resolve (sanity)
    assert int(jnp.sum(l1)) > 0
