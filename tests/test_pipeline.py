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
