"""Distributed operator tests on the 8-device virtual CPU mesh —
differential vs single-process oracles (SURVEY.md §4.3)."""
from functools import partial

import numpy as np
import pyarrow as pa
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gandiva_tpu.parallel import mesh as meshmod
from gandiva_tpu.parallel.ops import (dist_hash_aggregate, dist_join,
                                      dist_sort)

AXIS = meshmod.PARTITION_AXIS


def _mesh():
    return meshmod.make_mesh()


def _shard(mesh, *arrays):
    sh = NamedSharding(mesh, P(AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)


def test_dist_hash_aggregate():
    mesh = _mesh()
    ndev = len(jax.devices())
    nper = 512
    total = nper * ndev
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, total).astype(np.int64)
    vals = rng.integers(-100, 100, total).astype(np.int64)
    valid = rng.random(total) < 0.9

    def step(k, v, ok):
        res = dist_hash_aggregate(
            k, ok, {"v": (v, None)},
            [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")],
            AXIS, capacity=4 * nper, max_groups=128)
        # per-shard scalars need a leading dim to shard over the axis
        return {k2: (v2[None] if v2.ndim == 0 else v2)
                for k2, v2 in res.items()}

    f = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS)))
    res = f(*_shard(mesh, jnp.asarray(keys), jnp.asarray(vals),
                    jnp.asarray(valid)))
    assert not bool(np.asarray(res["overflow"]).any())

    # gather per-shard group tables and merge
    got = {}
    G = 128 + 1
    gk = np.asarray(res["keys"]).reshape(ndev, G)
    gc = np.asarray(res["group_count"]).reshape(ndev)
    s = np.asarray(res["agg:v:sum"]).reshape(ndev, G)
    c = np.asarray(res["agg:v:count"]).reshape(ndev, G)
    mn = np.asarray(res["agg:v:min"]).reshape(ndev, G)
    mx = np.asarray(res["agg:v:max"]).reshape(ndev, G)
    for d in range(ndev):
        for i in range(gc[d]):
            k = int(gk[d, i])
            assert k not in got, "key appears on two shards"
            got[k] = (s[d, i], c[d, i], mn[d, i], mx[d, i])

    # oracle
    kept = valid
    expect = {}
    for k in np.unique(keys[kept]):
        sel = vals[kept & (keys == k)]
        expect[int(k)] = (sel.sum(), len(sel), sel.min(), sel.max())
    assert got == expect


@pytest.mark.parametrize("how", ["inner", "left", "semi"])
def test_dist_join(how):
    mesh = _mesh()
    ndev = len(jax.devices())
    nper = 256
    total = nper * ndev
    rng = np.random.default_rng(1)
    probe = rng.integers(0, 300, total).astype(np.int64)
    pv = rng.integers(0, 1000, total).astype(np.int64)
    build_per = 64
    btotal = build_per * ndev
    build = rng.permutation(2000)[:btotal].astype(np.int64)  # unique keys
    bv = rng.integers(0, 1000, btotal).astype(np.int64)

    def step(pk, pvv, bk, bvv):
        res, cols, row_ok, overflow = dist_join(
            pk, jnp.ones_like(pk, dtype=bool), {"pv": (pvv, None)},
            bk, jnp.ones_like(bk, dtype=bool), {"bv": (bvv, None)},
            AXIS, probe_capacity=4 * nper, build_capacity=4 * build_per,
            out_capacity=8 * nper, how=how)
        pvo, pvov = cols["pv"] if "pv" in cols else (jnp.zeros(1), None)
        out_k, out_kv = cols["__probe_key"]
        bvo, bvov = cols.get("bv", (jnp.zeros_like(out_k), None))
        return (out_k, pvo, bvo, bvov if bvov is not None else row_ok,
                row_ok, res.count[None], overflow[None])

    f = jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS),) * 4,
        out_specs=(P(AXIS),) * 7))
    out_k, pvo, bvo, bvok, row_ok, counts, overflow = f(
        *_shard(mesh, jnp.asarray(probe), jnp.asarray(pv)),
        *_shard(mesh, jnp.asarray(build), jnp.asarray(bv)))
    assert not bool(np.asarray(overflow).any())

    row_ok = np.asarray(row_ok)
    got = []
    pvo, bvo, bvok = map(np.asarray, (pvo, bvo, bvok))
    for i in range(len(row_ok)):
        if row_ok[i]:
            if how == "semi":
                got.append(int(pvo[i]))
            else:
                got.append((int(pvo[i]),
                            int(bvo[i]) if bvok[i] else None))
    got.sort(key=lambda x: x if how == "semi" else str(x))

    # oracle via pyarrow table join on the payload values
    pt = pa.table({"k": probe, "pv": pv})
    bt = pa.table({"k": build, "bv": bv})
    how_map = {"inner": "inner", "left": "left outer", "semi": "left semi"}
    ores = pt.join(bt, keys="k", join_type=how_map[how],
                   coalesce_keys=False).to_pylist()
    if how == "semi":
        expect = sorted(r["pv"] for r in ores)
    else:
        expect = sorted(((r["pv"], r["bv"]) for r in ores),
                        key=lambda x: (str(x)))
    assert got == expect


@pytest.mark.parametrize("nulls_first", [True, False])
def test_dist_sort(nulls_first):
    mesh = _mesh()
    ndev = len(jax.devices())
    nper = 256
    total = nper * ndev
    rng = np.random.default_rng(2)
    keys = rng.integers(-10000, 10000, total).astype(np.int64)
    payload = np.arange(total, dtype=np.int64)
    null = rng.random(total) < 0.08

    def run(k, p, notnull):
        return dist_sort(k, notnull, {"p": (p, None)}, AXIS,
                         capacity=4 * nper, nulls_first=nulls_first)

    f = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P())))
    out_k, out_valid, out_null, out_payload, overflow = f(
        *_shard(mesh, jnp.asarray(keys), jnp.asarray(payload),
                jnp.asarray(~null)))
    assert not bool(overflow)
    out_k = np.asarray(out_k)
    out_valid = np.asarray(out_valid)
    out_null = np.asarray(out_null)
    pvals = np.asarray(out_payload["p"][0])

    real = out_valid
    nn = real & ~out_null
    got_nonnull = out_k[nn]
    np.testing.assert_array_equal(got_nonnull,
                                  np.sort(keys[~null], kind="stable"))
    # null rows all present, at the requested end
    assert (real & out_null).sum() == null.sum()
    null_positions = np.nonzero(real & out_null)[0]
    value_positions = np.nonzero(nn)[0]
    if nulls_first and len(null_positions):
        assert null_positions.max() < value_positions.min()
    elif len(null_positions):
        assert null_positions.min() > value_positions.max()
    # payload rides along
    np.testing.assert_array_equal(keys[pvals[nn]], got_nonnull)


def test_dist_sort_skewed():
    mesh = _mesh()
    ndev = len(jax.devices())
    nper = 256
    total = nper * ndev
    rng = np.random.default_rng(5)
    # heavy skew: zipf keys — range partitioner must still balance enough
    keys = (rng.zipf(1.3, total) % 1000).astype(np.int64)
    payload = np.arange(total, dtype=np.int64)

    def run(k, p):
        return dist_sort(k, jnp.ones_like(k, dtype=bool), {"p": (p, None)},
                         AXIS, capacity=8 * nper)

    f = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P())))
    out_k, out_valid, out_null, out_payload, overflow = f(
        *_shard(mesh, jnp.asarray(keys), jnp.asarray(payload)))
    if bool(overflow):
        pytest.skip("range partitioner overflow under this capacity "
                    "(documented: retry with larger capacity)")
    out_k = np.asarray(out_k)[np.asarray(out_valid)]
    np.testing.assert_array_equal(out_k, np.sort(keys, kind="stable"))


@pytest.mark.parametrize("how", ["inner", "semi", "right", "full"])
def test_dist_join_skewed(how):
    from gandiva_tpu.parallel.ops import dist_join_skewed

    mesh = _mesh()
    ndev = len(jax.devices())
    nper = 512
    total = nper * ndev
    rng = np.random.default_rng(11)
    # heavy Zipf: one key dominates
    probe = (rng.zipf(1.3, total) % 200).astype(np.int64)
    pv = rng.integers(0, 1000, total).astype(np.int64)
    build_per = 32
    btotal = build_per * ndev
    build = rng.permutation(400)[:btotal].astype(np.int64)
    bv = rng.integers(0, 1000, btotal).astype(np.int64)

    def step(pk, pvv, bk, bvv):
        res, cols, row_ok, overflow = dist_join_skewed(
            pk, jnp.ones_like(pk, dtype=bool), {"pv": (pvv, None)},
            bk, jnp.ones_like(bk, dtype=bool), {"bv": (bvv, None)},
            AXIS, probe_capacity=3 * nper, build_capacity=4 * build_per,
            out_capacity=4 * nper, how=how, num_hot=16,
            hot_replicate_capacity=64)
        pvo, pvok = cols["pv"]
        bvo, bvok = cols.get("bv", (jnp.zeros_like(pvo), row_ok))
        return pvo, pvok, bvo, bvok, row_ok, overflow[None]

    f = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(AXIS),) * 4, out_specs=(P(AXIS),) * 6))
    pvo, pvok, bvo, bvok, row_ok, overflow = f(
        *_shard(mesh, jnp.asarray(probe), jnp.asarray(pv)),
        *_shard(mesh, jnp.asarray(build), jnp.asarray(bv)))
    assert not bool(np.asarray(overflow).any())

    row_ok = np.asarray(row_ok)
    pvo, pvok, bvo, bvok = map(np.asarray, (pvo, pvok, bvo, bvok))
    if how == "semi":
        got = sorted(int(pvo[i]) for i in range(len(row_ok)) if row_ok[i])
    else:
        got = sorted(((int(pvo[i]) if pvok[i] else None,
                       int(bvo[i]) if bvok[i] else None)
                      for i in range(len(row_ok)) if row_ok[i]),
                     key=str)

    pt = pa.table({"k": probe, "pv": pv})
    bt = pa.table({"k": build, "bv": bv})
    how_map = {"inner": "inner", "semi": "left semi",
               "right": "right outer", "full": "full outer"}
    ores = pt.join(bt, keys="k", join_type=how_map[how],
                   coalesce_keys=False).to_pylist()
    if how == "semi":
        expect = sorted(r["pv"] for r in ores)
    else:
        expect = sorted(((r["pv"], r["bv"]) for r in ores), key=str)
    assert got == expect
