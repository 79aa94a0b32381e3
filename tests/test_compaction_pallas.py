"""Pallas compaction kernel tests (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gandiva_tpu.ops.kernels import compaction_pallas as cp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(cp.pl, "pallas_call", interp)
    yield


@pytest.mark.parametrize("density", [0.0, 0.02, 0.43, 0.97, 1.0])
def test_compact_columns(density):
    rng = np.random.default_rng(int(density * 100))
    n = 8192
    mask_np = rng.random(n) < density
    mask = jnp.asarray(mask_np)
    v64 = jnp.asarray(rng.integers(-10**12, 10**12, n))
    vf64 = jnp.asarray(rng.random(n))
    vb = jnp.asarray(rng.random(n) < 0.5)
    idx, cols, count = cp.compact_columns(mask, [v64, vf64, vb])
    c = int(count)
    exp = np.nonzero(mask_np)[0]
    assert c == len(exp)
    np.testing.assert_array_equal(np.asarray(idx)[:c], exp)
    np.testing.assert_array_equal(np.asarray(cols[0])[:c],
                                  np.asarray(v64)[mask_np])
    np.testing.assert_array_equal(np.asarray(cols[1])[:c],
                                  np.asarray(vf64)[mask_np])
    np.testing.assert_array_equal(np.asarray(cols[2])[:c],
                                  np.asarray(vb)[mask_np])


def test_butterfly_matches_sort():
    from gandiva_tpu.ops.compaction import compact_sort

    rng = np.random.default_rng(7)
    n = 4096
    mask = jnp.asarray(rng.random(n) < 0.3)
    vals = jnp.asarray(rng.integers(0, 10**9, n))
    idx1, cols, c1 = cp.compact_columns(mask, [vals], rows_per_block=32)
    idx2, c2, packed = compact_sort(mask, [vals])
    assert int(c1) == int(c2)
    np.testing.assert_array_equal(np.asarray(idx1)[:int(c1)],
                                  np.asarray(idx2)[:int(c2)])
    np.testing.assert_array_equal(np.asarray(cols[0])[:int(c1)],
                                  np.asarray(packed[0])[:int(c2)])


@pytest.mark.parametrize("density", [0.0, 0.03, 0.5, 0.97, 1.0])
def test_fragnet_matches_oracle(density):
    """r5: the fragment-network kernel (vectorized rotation + monotone
    shift-merge placement) must pack exactly like the oracle."""
    rng = np.random.default_rng(int(density * 77) + 1)
    n = 4 * cp.BLOCK
    mask_np = rng.random(n) < density
    pay = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(3)]
    packed, count = cp.compact_pallas_u32_fragnet(
        jnp.asarray(mask_np), [jnp.asarray(p).view(jnp.int32) for p in pay])
    c = int(count)
    assert c == int(mask_np.sum())
    for got, exp in zip(packed, pay):
        np.testing.assert_array_equal(
            np.asarray(got.view(jnp.uint32))[:c], exp[mask_np])


def test_fragnet_small_blocks():
    rng = np.random.default_rng(5)
    rows = 32
    n = 3 * rows * 128
    mask_np = rng.random(n) < 0.21
    pay = rng.integers(0, 2**31, n, dtype=np.int32)
    packed, count = cp.compact_pallas_u32_fragnet(
        jnp.asarray(mask_np), [jnp.asarray(pay)], rows_per_block=rows)
    c = int(count)
    np.testing.assert_array_equal(np.asarray(packed[0])[:c], pay[mask_np])
