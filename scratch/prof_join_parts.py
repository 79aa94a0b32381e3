import time, os
import jax, jax.numpy as jnp, numpy as np

def timeit(f, *args, iters=3):
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

N = 100_000_000
rng = np.random.default_rng(42)
# 16-byte row gather: [T,4] i32 table, N random rows
T = 16_000_000
tbl = jnp.asarray(rng.integers(0, 2**31, (T, 4), dtype=np.int32))
idx = jnp.asarray(rng.integers(0, T, N, dtype=np.int32))
t = timeit(jax.jit(lambda tb, i: tb[i].sum()), tbl, idx)
print(f"16B-row gather 100M from 16M-row table: {t*1e3:.0f} ms ({t/N*1e9:.1f} ns/row)")

# 64-byte row gather (current window)
tblw = jnp.asarray(rng.integers(0, 2**31, (T//4, 16), dtype=np.int32))
idxw = jnp.asarray(rng.integers(0, T//4, N, dtype=np.int32))
t = timeit(jax.jit(lambda tb, i: tb[i].sum()), tblw, idxw)
print(f"64B-row gather 100M: {t*1e3:.0f} ms ({t/N*1e9:.1f} ns/row)")

# 4-byte gather for comparison
tbl1 = tbl[:, 0]
t = timeit(jax.jit(lambda tb, i: tb[i].sum()), tbl1, idx)
print(f"4B gather 100M: {t*1e3:.0f} ms ({t/N*1e9:.1f} ns/row)")

# current full join profile
from gandiva_tpu.ops.hash_join import join
@jax.jit
def run(probe, build):
    res = join(probe, build, N, "inner")
    return (res.count.astype(jnp.int64) + res.probe_idx[0] + res.build_idx[-1])
key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (N,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0/0.3)).astype(jnp.int64) % 1_000_000
build = jnp.arange(1_000_000, dtype=jnp.int64)
t = timeit(run, probe, build)
print(f"current join 100Mx1M: {t*1e3:.0f} ms ({N/t/1e6:.1f} Mrows/s, {t/N*1e9:.1f} ns/row)")
