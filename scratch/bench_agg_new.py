import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.hash_aggregate import hash_aggregate

def timeit(f, *args, iters=3):
    float(f(*args)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

n = 100_000_000
key = jax.random.PRNGKey(5)
k1, k2 = jax.random.split(key)

# configs[1] original: int64 values, 64 groups
keys = jax.random.randint(k1, (n,), 0, 64, dtype=jnp.int64)
ivals = jax.random.randint(k2, (n,), -10**9, 10**9, dtype=jnp.int64)
f = jax.jit(lambda k, v: hash_aggregate(
    k, [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")],
    {"v": (v, None)}, max_groups=64)["agg:v:sum"][0])
t = timeit(f, keys, ivals)
print(f"int64 64g: {t*1e3:.0f} ms ({n/t/1e6:.0f} Mrows/s)")

# float64 values, 64 groups (the new tier)
fvals = jax.random.uniform(k2, (n,), dtype=jnp.float64) * 1000
f2 = jax.jit(lambda k, v: hash_aggregate(
    k, [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")],
    {"v": (v, None)}, max_groups=64)["agg:v:sum"][0])
t = timeit(f2, keys, fvals)
print(f"f64 64g: {t*1e3:.0f} ms ({n/t/1e6:.0f} Mrows/s)")

# 512 groups int
keys512 = jax.random.randint(k1, (n,), 0, 512, dtype=jnp.int64)
f3 = jax.jit(lambda k, v: hash_aggregate(
    k, [("v", "sum"), ("v", "count")], {"v": (v, None)},
    max_groups=512)["agg:v:sum"][0])
t = timeit(f3, keys512, ivals)
print(f"int64 512g: {t*1e3:.0f} ms ({n/t/1e6:.0f} Mrows/s)")

# 512 groups via XLA scatter tier for comparison
f4 = jax.jit(lambda k, v: hash_aggregate(
    k, [("v", "sum"), ("v", "count")], {"v": (v, None)},
    max_groups=512, backend="xla")["agg:v:sum"][0])
t = timeit(f4, keys512, ivals)
print(f"int64 512g XLA tier: {t*1e3:.0f} ms ({n/t/1e6:.0f} Mrows/s)")
