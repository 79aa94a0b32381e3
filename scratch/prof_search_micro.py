import time
import jax, jax.numpy as jnp, numpy as np

def timeit(f, *args, iters=5):
    float(f(*args)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

N = 100_000_000
T = 3052
rng = np.random.default_rng(0)
big = jnp.asarray(rng.integers(-2**31, 2**31, N, dtype=np.int32))
idx = jnp.asarray(rng.integers(0, N, T, dtype=np.int32))

# 64 chained small gathers (dependency chain like binary search)
def chain(big, idx):
    s = idx
    for _ in range(64):
        v = jnp.take(big, s, mode="clip")
        s = (s + (v & 1023)) % N
    return s.sum()
t = timeit(jax.jit(chain), big, idx)
print(f"64 chained small gathers: {t*1e3:.1f} ms ({t/64*1e6:.0f} us/gather)")

# 64 independent small gathers
def indep(big, idx):
    acc = jnp.int32(0)
    for k in range(64):
        acc = acc + jnp.take(big, (idx + k) % N, mode="clip").sum()
    return acc
t = timeit(jax.jit(indep), big, idx)
print(f"64 independent small gathers: {t*1e3:.1f} ms")

# single big-op baseline: 1 elementwise pass over N
t = timeit(jax.jit(lambda b: (b+1)[0] + b[-1]), big)
print(f"1 elementwise pass: {t*1e3:.1f} ms")

# empty-ish jit (dispatch floor)
t = timeit(jax.jit(lambda i: (i+1).sum()), idx)
print(f"tiny jit total: {t*1e3:.2f} ms")
