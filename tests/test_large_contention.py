"""Large-N contention tests (VERDICT r2 ask #9): hash tables under real
load where probe/build chains take multiple rounds, duplicate-key behavior
at scale, and the unique-path dup flag. CPU mesh, so sizes are picked to
finish in seconds while still forcing multi-round probing.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gandiva_tpu.ops.hash_aggregate import hash_aggregate
from gandiva_tpu.ops.hash_join import join, _hash_probe_unique


def test_join_dup_keys_1m_vs_numpy():
    """General path at 1M probe x 256k build with ~4x duplicate build keys:
    every (probe, build) pair must match the numpy oracle exactly."""
    rng = np.random.default_rng(42)
    NP_, NB = 1 << 20, 1 << 18
    probe = rng.integers(0, NB // 4, NP_).astype(np.int64)
    build = rng.integers(0, NB // 4, NB).astype(np.int64)

    # oracle: pair counts per key via bincount products
    pc = np.bincount(probe, minlength=NB // 4)
    bc = np.bincount(build, minlength=NB // 4)
    total = int((pc.astype(np.int64) * bc.astype(np.int64)).sum())

    cap = total + 64
    res = jax.jit(lambda p, b: join(p, b, cap, "inner"))(
        jnp.asarray(probe), jnp.asarray(build))
    assert not bool(res.overflow)
    cnt = int(res.count)
    assert cnt == total
    pi = np.asarray(res.probe_idx)[:cnt]
    bi = np.asarray(res.build_idx)[:cnt]
    # exact pair verification without materializing the pair set: keys must
    # agree pairwise, every pair distinct, and per-key pair counts match
    assert (probe[pi] == build[bi]).all()
    pair_ids = pi.astype(np.int64) * NB + bi
    assert np.unique(pair_ids).size == cnt


def test_hash_probe_unique_dup_flag():
    """Duplicate build keys on the unique fast path must set the dup flag
    (the documented caller fallback trigger)."""
    probe = jnp.arange(1024, dtype=jnp.int64)
    build_ok = jnp.arange(512, dtype=jnp.int64) * 2
    build_dup = build_ok.at[17].set(44)  # 44 appears twice (22*2 and slot 17)
    kv = jnp.ones((512,), bool)
    pkv = jnp.ones((1024,), bool)
    f = jax.jit(lambda p, b: _hash_probe_unique(p, b, pkv, kv))
    _, _, dup = f(probe, build_ok)
    assert not bool(dup)
    matched, bidx, dup = f(probe, build_dup)
    assert bool(dup)
    # and join() surfaces it through the overflow-style flag
    res = jax.jit(lambda p, b: join(p, b, 2048, "inner",
                                    build_unique=True))(probe, build_dup)
    assert bool(res.overflow)


def test_aggregate_high_cardinality_4m():
    """4M rows, 100k+ distinct keys — the table takes multiple probe rounds
    under contention; sums/counts must match numpy exactly."""
    rng = np.random.default_rng(7)
    N, K = 1 << 22, 100_003
    keys = rng.integers(0, K, N).astype(np.int64)
    vals = rng.integers(-1000, 1000, N).astype(np.int64)

    res = jax.jit(lambda k, v: hash_aggregate(
        k, [("v", "sum"), ("v", "count")], {"v": (v, None)},
        max_groups=1 << 17))(jnp.asarray(keys), jnp.asarray(vals))
    g = int(res["group_count"])
    assert g == np.unique(keys).size
    got_keys = np.asarray(res["keys"])[:g]
    got_sum = np.asarray(res["agg:v:sum"])[:g]
    got_cnt = np.asarray(res["agg:v:count"])[:g]
    order = np.argsort(got_keys)
    exp_sum = np.bincount(keys, weights=vals.astype(np.float64),
                          minlength=K)
    exp_cnt = np.bincount(keys, minlength=K)
    present = np.nonzero(exp_cnt)[0]
    np.testing.assert_array_equal(got_keys[order], present)
    np.testing.assert_array_equal(got_cnt[order], exp_cnt[present])
    np.testing.assert_array_equal(got_sum[order],
                                  exp_sum[present].astype(np.int64))
