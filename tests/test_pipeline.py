"""End-to-end distributed pipeline vs single-process pyarrow oracle."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import jax

from gandiva_tpu.parallel import mesh as meshmod
from gandiva_tpu.parallel.pipeline import (build_filter_join_agg_sort,
                                           run_pipeline)


def test_pipeline_matches_arrow():
    mesh = meshmod.make_mesh()
    ndev = len(jax.devices())
    nper, build_per = 1024, 64
    rng = np.random.default_rng(123)
    total = nper * ndev
    btotal = build_per * ndev
    orders_key = (rng.zipf(1.4, total) % (btotal * 2)).astype(np.int64)
    orders_amt = rng.integers(1, 100, total).astype(np.int64)
    dim_key = rng.permutation(btotal * 2)[:btotal].astype(np.int64)
    dim_seg = rng.integers(0, 7, btotal).astype(np.int64)

    jitted = build_filter_join_agg_sort(mesh, nper, build_per, num_groups=16,
                                        filter_threshold=50)
    keys, sums, counts, metrics = run_pipeline(
        jitted, orders_key, orders_amt, dim_key, dim_seg, mesh)

    # oracle
    orders = pa.table({"k": orders_key, "amt": orders_amt})
    dim = pa.table({"k": dim_key, "seg": dim_seg})
    filt = orders.filter(pc.greater(orders.column("amt"), 50))
    joined = filt.join(dim, keys="k", join_type="inner")
    agg = joined.group_by("seg").aggregate([("amt", "sum"),
                                            ("amt", "count")])
    expect = sorted((r["seg"], r["amt_sum"], r["amt_count"])
                    for r in agg.to_pylist())

    got = sorted(zip(keys.tolist(), sums.tolist(), counts.tolist()))
    assert got == expect
    # sortedness of the returned group keys
    assert list(keys) == sorted(keys)
    # metrics surface
    assert metrics["rows_in"] == total
    assert metrics["filter_out"] == int(np.sum(orders_amt > 50))
    assert metrics["join_out"] == joined.num_rows


def test_pipeline_overflow_retry_recovers():
    """Status-style overflow→retry contract (SURVEY.md §5.3, §7 hard part
    #1): a capacity too small for the skew MUST overflow, and
    run_pipeline_with_retry must recover by doubling factors and still
    match the oracle."""
    from gandiva_tpu.parallel.pipeline import (PipelineOverflowError,
                                               run_pipeline_with_retry)

    mesh = meshmod.make_mesh()
    ndev = len(jax.devices())
    nper, build_per = 512, 32
    rng = np.random.default_rng(7)
    total = nper * ndev
    btotal = build_per * ndev
    # heavy skew: most probe rows carry ONE key → its destination shard
    # receives far more than nper rows, overflowing shuffle_factor=1
    orders_key = np.where(rng.random(total) < 0.8, 3,
                          rng.integers(0, btotal * 2, total)).astype(np.int64)
    orders_amt = rng.integers(1, 100, total).astype(np.int64)
    dim_key = rng.permutation(btotal * 2)[:btotal].astype(np.int64)
    dim_key[0] = 3  # ensure the hot key joins
    dim_seg = rng.integers(0, 7, btotal).astype(np.int64)

    # with num_hot=0 nothing shields the hot key: factor-1 must overflow
    jitted = build_filter_join_agg_sort(mesh, nper, build_per, num_groups=16,
                                        filter_threshold=50,
                                        shuffle_factor=1, out_factor=1,
                                        num_hot=0, hot_capacity=1)
    with pytest.raises(PipelineOverflowError):
        run_pipeline(jitted, orders_key, orders_amt, dim_key, dim_seg, mesh)

    keys, sums, counts, metrics = run_pipeline_with_retry(
        mesh, orders_key, orders_amt, dim_key, dim_seg, num_groups=16,
        filter_threshold=50, shuffle_factor=1, out_factor=1,
        num_hot=0, hot_capacity=1)
    assert metrics["retries"] >= 1          # it DID overflow then recover
    assert metrics["shuffle_factor"] > 1

    orders = pa.table({"k": orders_key, "amt": orders_amt})
    dim = pa.table({"k": dim_key, "seg": dim_seg})
    filt = orders.filter(pc.greater(orders.column("amt"), 50))
    joined = filt.join(dim, keys="k", join_type="inner")
    agg = joined.group_by("seg").aggregate([("amt", "sum"),
                                            ("amt", "count")])
    expect = sorted((r["seg"], r["amt_sum"], r["amt_count"])
                    for r in agg.to_pylist())
    got = sorted(zip(keys.tolist(), sums.tolist(), counts.tolist()))
    assert got == expect


def test_scaling_efficiency_harness():
    """configs[4] accounting harness: monotone device counts, efficiency
    computed from the pipeline's own walls, fields complete."""
    from gandiva_tpu.parallel.pipeline import measure_scaling_efficiency

    ndev = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= ndev]
    rows = measure_scaling_efficiency(counts, total_rows=1024 * counts[-1],
                                      total_build=128 * counts[-1],
                                      num_groups=16, repeats=1,
                                      num_hot=8, hot_capacity=32)
    assert [r["n_devices"] for r in rows] == counts
    for r in rows:
        assert r["wall_s"] > 0 and r["rows_per_s"] > 0
        assert r["efficiency"] > 0
    assert rows[0]["efficiency"] == pytest.approx(1.0)
