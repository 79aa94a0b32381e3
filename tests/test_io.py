"""Streaming IO tests: prefetcher correctness, error propagation."""
import numpy as np
import pyarrow as pa
import pytest

import gandiva_tpu as g
from gandiva_tpu import dtypes as dt
from gandiva_tpu.io import BatchPrefetcher, evaluate_stream

B = g.TreeExprBuilder


def _batches(n_batches, rows):
    rng = np.random.default_rng(0)
    for i in range(n_batches):
        yield pa.RecordBatch.from_arrays(
            [pa.array(rng.integers(0, 1000, rows) + i)], names=["a"])


def test_evaluate_stream():
    schema = dt.Schema([dt.Field("a", dt.int64)])
    expr = B.make_expression(
        B.make_function("multiply", [B.make_field(schema.field("a")),
                                     B.make_int64_literal(2)], dt.int64),
        dt.Field("r", dt.int64))
    proj = g.make_projector(schema, [expr], use_cache=False)

    src = list(_batches(5, 100))
    results = list(evaluate_stream(proj, src))
    assert len(results) == 5
    for batch, (out,) in zip(src, results):
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(batch.column("a")) * 2)
    assert proj.stats["evaluations"] == 5
    assert proj.stats["rows_in"] == 500


def test_prefetcher_propagates_errors():
    def bad_gen():
        yield pa.RecordBatch.from_arrays([pa.array([1, 2])], names=["a"])
        raise RuntimeError("source failed")

    it = iter(BatchPrefetcher(bad_gen()))
    next(it)
    with pytest.raises(RuntimeError, match="source failed"):
        list(it)
