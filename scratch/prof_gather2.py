import time
import jax, jax.numpy as jnp, numpy as np

def timeit(f, *args, iters=3):
    r = f(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*args)
        float(jnp.asarray(r).ravel()[0])  # force full host sync
        ts.append(time.perf_counter() - t0)
    return min(ts)

N = 100_000_000
rng = np.random.default_rng(42)
x = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
perm_r = jnp.asarray(rng.permutation(N).astype(np.int32))
f = jax.jit(lambda v, i: v[i].sum())
t = timeit(f, x, perm_r)
print(f"random gather+sum u32 100M: {t*1e3:.1f} ms ({N/t/1e6:.0f} M/s)")

d = np.asarray(jax.device_get(x)) & 255
perm_s = jnp.asarray(np.argsort(d, kind="stable").astype(np.int32))
f2 = jax.jit(lambda v, i: v[i].sum())
t = timeit(f2, x, perm_s)
print(f"digit-stream gather+sum: {t*1e3:.1f} ms ({N/t/1e6:.0f} M/s)")

# small-table gather: 100M lookups into a 390k-entry table
tbl = jnp.asarray(rng.integers(0, 2**32, 400_000, dtype=np.uint32))
idx_small = jnp.asarray(rng.integers(0, 400_000, N, dtype=np.int32))
f3 = jax.jit(lambda v, i: v[i].sum())
t = timeit(f3, tbl, idx_small)
print(f"small-table(400k) gather 100M lookups: {t*1e3:.1f} ms ({N/t/1e6:.0f} M/s)")

# tiny-table gather: 256-entry table
tbl2 = jnp.asarray(rng.integers(0, 2**32, 256, dtype=np.uint32))
idx_tiny = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))
f4 = jax.jit(lambda v, i: v[i].sum())
t = timeit(f4, tbl2, idx_tiny)
print(f"tiny-table(256) gather 100M lookups: {t*1e3:.1f} ms ({N/t/1e6:.0f} M/s)")
