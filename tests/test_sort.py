"""Sort tests — differential vs pyarrow.compute.sort_indices."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import jax.numpy as jnp

from gandiva_tpu.ops.sort import SortKey, normalize_key, sort_permutation


def test_normalize_preserves_order():
    rng = np.random.default_rng(0)
    for arr in [
        rng.integers(-(2 ** 62), 2 ** 62, 1000).astype(np.int64),
        rng.standard_normal(1000),
        rng.standard_normal(1000).astype(np.float32),
        np.array([0.0, -0.0, np.inf, -np.inf, 1.5, -1.5]),
        rng.integers(0, 2 ** 63, 1000).astype(np.uint64),
    ]:
        norm = np.asarray(normalize_key(jnp.asarray(arr)))
        np.testing.assert_array_equal(np.argsort(norm, kind="stable"),
                                      np.argsort(arr, kind="stable"))


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("nulls_first", [True, False])
def test_sort_vs_arrow(ascending, nulls_first):
    rng = np.random.default_rng(42)
    n = 4000
    keys = rng.integers(-1000, 1000, n).astype(np.int64)
    nulls = rng.random(n) < 0.1
    arr = pa.array(keys, mask=nulls)
    perm = sort_permutation([SortKey(jnp.asarray(keys),
                                     validity=jnp.asarray(~nulls),
                                     ascending=ascending,
                                     nulls_first=nulls_first)])
    expected = pc.sort_indices(
        arr, sort_keys=[("x", "ascending" if ascending else "descending")],
        null_placement="at_start" if nulls_first else "at_end")
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(expected))


def test_sort_multi_column():
    rng = np.random.default_rng(1)
    n = 2000
    a = rng.integers(0, 10, n).astype(np.int64)
    b = rng.standard_normal(n)
    t = pa.table({"a": a, "b": b})
    perm = sort_permutation([
        SortKey(jnp.asarray(a), ascending=True),
        SortKey(jnp.asarray(b), ascending=False),
    ])
    expected = pc.sort_indices(
        t, sort_keys=[("a", "ascending"), ("b", "descending")])
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(expected))


def test_sort_padding_goes_last():
    keys = jnp.asarray(np.array([5, 1, 9, 777, 888], dtype=np.int64))
    perm = sort_permutation([SortKey(keys)], length=3)
    # rows 3,4 are padding: must sort after all real rows
    assert set(np.asarray(perm)[:3].tolist()) == {0, 1, 2}
    np.testing.assert_array_equal(np.asarray(perm)[:3], [1, 0, 2])
