"""Merge-path sort kernel (ops/kernels/merge_path.py) in interpret mode.

The TPU dispatch (ops/sort._use_merge) is covered by the bench; these tests
pin the network's correctness — stability, carries, odd run counts, ties —
against numpy argsort on the CPU interpreter. W is shrunk to 1024 rows so
several merge rounds (and an odd-run pass-through) execute quickly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gandiva_tpu.ops.kernels.merge_path import merge_sort_u32

W_LOG2 = 10  # 1024-row leaves → n=5000 exercises 3 rounds + odd pairing


def _expect(hi, lo):
    key = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
    return np.argsort(key, kind="stable")


@pytest.mark.parametrize("n", [100, 1024, 3000, 5000, 16385])
def test_two_limb_with_carry(n):
    rng = np.random.default_rng(n)
    hi = rng.integers(0, 2 ** 32, n, dtype=np.uint32)
    lo = rng.integers(0, 2 ** 32, n, dtype=np.uint32)
    pay = rng.integers(0, 2 ** 32, n, dtype=np.uint32)
    perm, slimbs, scarry = merge_sort_u32(
        [jnp.asarray(hi), jnp.asarray(lo)], [jnp.asarray(pay)],
        w_log2=W_LOG2, interpret=True)
    exp = _expect(hi, lo)
    np.testing.assert_array_equal(np.asarray(perm), exp)
    np.testing.assert_array_equal(np.asarray(slimbs[0]), hi[exp])
    np.testing.assert_array_equal(np.asarray(slimbs[1]), lo[exp])
    np.testing.assert_array_equal(np.asarray(scarry[0]), pay[exp])


def test_stability_heavy_ties():
    n = 6000
    rng = np.random.default_rng(7)
    hi = (rng.integers(0, 3, n)).astype(np.uint32)
    lo = (rng.integers(0, 4, n)).astype(np.uint32)
    perm, slimbs, _ = merge_sort_u32(
        [jnp.asarray(hi), jnp.asarray(lo)], w_log2=W_LOG2, interpret=True)
    exp = _expect(hi, lo)
    np.testing.assert_array_equal(np.asarray(perm), exp)


def test_single_limb_sorted_and_reversed():
    n = 4096
    asc = np.arange(n, dtype=np.uint32)
    for keys in (asc, asc[::-1].copy()):
        perm, slimbs, _ = merge_sort_u32([jnp.asarray(keys)],
                                         w_log2=W_LOG2, interpret=True)
        exp = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(perm), exp)
        np.testing.assert_array_equal(np.asarray(slimbs[0]), keys[exp])


def test_multiple_carries_64bit_payload():
    n = 3000
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 100, n).astype(np.uint32)  # duplicate-heavy
    c1 = rng.integers(0, 2 ** 32, n, dtype=np.uint32)
    c2 = rng.integers(0, 2 ** 32, n, dtype=np.uint32)
    perm, _, scarry = merge_sort_u32(
        [jnp.asarray(keys)], [jnp.asarray(c1), jnp.asarray(c2)],
        w_log2=W_LOG2, interpret=True)
    exp = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(scarry[0]), c1[exp])
    np.testing.assert_array_equal(np.asarray(scarry[1]), c2[exp])
