"""Hybrid bitonic merge sort kernel tests (interpret mode on CPU).

The TPU dispatch itself (ops/sort._use_bitonic) is covered by the bench and
the TPU drive; here the network is validated against numpy's stable argsort
across block/padding/stability regimes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gandiva_tpu.ops.kernels.sort_bitonic import (bitonic_sort_u32,
                                                  operands_to_limbs)


def _sort64(keys_u64, w):
    lo = jnp.asarray((keys_u64 & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((keys_u64 >> 32).astype(np.uint32))
    interp = jax.default_backend() != "tpu"
    perm, _ = bitonic_sort_u32([hi, lo], w_log2=w, interpret=interp)
    return np.asarray(perm)


@pytest.mark.parametrize("n,w", [(2048, 10), (4096, 10), (5000, 10),
                                 (65536, 12)])
def test_bitonic_matches_stable_argsort(n, w):
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2 ** 63, n, dtype=np.uint64)
    np.testing.assert_array_equal(_sort64(keys, w),
                                  np.argsort(keys, kind="stable"))


def test_bitonic_stability_on_duplicates():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 16, 8192).astype(np.uint64)
    np.testing.assert_array_equal(_sort64(keys, 10),
                                  np.argsort(keys, kind="stable"))


def test_bitonic_single_limb_and_tiny():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2 ** 32, 512, dtype=np.uint64).astype(np.uint32)
    perm, _ = bitonic_sort_u32([jnp.asarray(keys)], w_log2=10,
                               interpret=jax.default_backend() != "tpu")
    np.testing.assert_array_equal(np.asarray(perm),
                                  np.argsort(keys, kind="stable"))


def test_operands_to_limbs_roundtrip_order():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2 ** 63, 2048, dtype=np.uint64)
    rank = rng.integers(0, 3, 2048).astype(np.uint32)
    limbs, spans = operands_to_limbs([jnp.asarray(rank), jnp.asarray(a)])
    assert len(limbs) == 3 and spans == [(0, 1), (1, 2)]
    perm, sorted_limbs = bitonic_sort_u32(
        limbs, w_log2=10, interpret=jax.default_backend() != "tpu")
    order = np.lexsort((np.arange(2048), a, rank))
    np.testing.assert_array_equal(np.asarray(perm), order)
    # sorted limbs decode to the sorted operand values
    got = (np.asarray(sorted_limbs[1]).astype(np.uint64) << 32) \
        | np.asarray(sorted_limbs[2])
    np.testing.assert_array_equal(got, a[order])


def test_sort_columns_denormalize_roundtrip():
    """sort_columns reconstructs sorted key values from sorted norms —
    validate per dtype against gather-by-perm."""
    from gandiva_tpu.ops.sort import SortKey, sort_columns

    rng = np.random.default_rng(4)
    n = 4096
    for arr in (rng.integers(-2 ** 62, 2 ** 62, n).astype(np.int64),
                rng.integers(-2 ** 30, 2 ** 30, n).astype(np.int32),
                rng.standard_normal(n).astype(np.float32),
                rng.standard_normal(n) * 1e12,
                rng.integers(0, 2 ** 63, n, dtype=np.uint64)):
        for asc in (True, False):
            perm, (sk,), _ = sort_columns(
                [SortKey(jnp.asarray(arr), ascending=asc)])
            np.testing.assert_array_equal(np.asarray(sk),
                                          arr[np.asarray(perm)])
