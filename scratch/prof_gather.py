"""Measure TPU random-access primitive costs at sort scale (100M rows).

Decides radix-sort design: gather-based permutation apply vs DMA scatter
vs merge-path. Run on the real TPU chip.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=3):
    r = f(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N = 100_000_000
    rng = np.random.default_rng(42)
    print("backend:", jax.default_backend())

    x = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    # 1. random permutation gather
    perm_r = jnp.asarray(rng.permutation(N).astype(np.int32))
    t = timeit(jax.jit(lambda v, i: v[i]), x, perm_r)
    print(f"random gather u32 100M: {t*1e3:.1f} ms  ({N/t/1e6:.0f} M/s)")

    # 2. radix-stream gather: 256 interleaved ascending streams
    # sources for digit-segment t: ascending indices with stride ~256
    d = np.asarray(jax.device_get(x)) & 255
    perm_s = jnp.asarray(np.argsort(d, kind="stable").astype(np.int32))
    t = timeit(jax.jit(lambda v, i: v[i]), x, perm_s)
    print(f"digit-stream gather u32 100M: {t*1e3:.1f} ms  ({N/t/1e6:.0f} M/s)")

    # 3. contiguous copy (roofline anchor)
    t = timeit(jax.jit(lambda v: v + jnp.uint32(1)), x)
    print(f"elementwise pass u32 100M: {t*1e3:.1f} ms  ({N/t/1e6:.0f} M/s)")

    # 4. XLA scatter (set at random indices)
    t = timeit(jax.jit(lambda v, i: jnp.zeros_like(v).at[i].set(v)), x, perm_r)
    print(f"random scatter u32 100M: {t*1e3:.1f} ms  ({N/t/1e6:.0f} M/s)")

    # 5. sorted-segment take: gather where idx is block-local + offsets
    # (merge-path style reads are dynamic slices; approximate w/ iota+noise)
    near = (jnp.arange(N, dtype=jnp.int32) + 64) % N
    t = timeit(jax.jit(lambda v, i: v[i]), x, near)
    print(f"near-identity gather u32 100M: {t*1e3:.1f} ms  ({N/t/1e6:.0f} M/s)")


if __name__ == "__main__":
    main()
