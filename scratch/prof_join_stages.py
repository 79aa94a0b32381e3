import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops import hash_join as hj
from gandiva_tpu.ops.sort import SortKey, normalize_key, _sort_full

def timeit(f, *args, iters=3):
    float(f(*args)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts) - 0.024   # axon dispatch floor

N, NB = 100_000_000, 1_000_000
key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (N,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0/0.3)).astype(jnp.int64) % NB
build = jnp.arange(NB, dtype=jnp.int64)

# stage 1: build only
def build_only(p, b):
    kv = jnp.ones((NB,), bool)
    perm, (sk,), _ = _sort_full([SortKey(b, validity=kv, nulls_first=False)], None)
    return perm[0] + sk[0].astype(jnp.int64)
t = timeit(jax.jit(build_only), probe, build)
print(f"build(sort) only: {t*1e3:.0f} ms ({t/N*1e9:.1f} ns/probe-row)")

# stage 2: probe (ranges) only
def probe_only(p, b):
    kv = jnp.ones((NB,), bool)
    pkv = jnp.ones((N,), bool)
    perm, (sk,), _ = _sort_full([SortKey(b, validity=kv, nulls_first=False)], None)
    sk = jnp.where(jnp.ones((NB,), bool), sk, 0)
    pk = normalize_key(p)
    lo, ln, uniq = hj._hash_probe_ranges(pk, sk, jnp.int32(NB), pkv, perm=perm)
    return lo[0] + ln[-1] + uniq.astype(jnp.int32)
t = timeit(jax.jit(probe_only), probe, build)
print(f"build+probe: {t*1e3:.0f} ms ({t/N*1e9:.1f} ns/row)")

# stage 3: full join, light checksum (no big sums)
def join_light(p, b):
    res = hj.join(p, b, N, "inner")
    return res.count + res.probe_idx[0] + res.build_idx[-1]
t = timeit(jax.jit(join_light), probe, build)
print(f"full join (light checksum): {t*1e3:.0f} ms ({t/N*1e9:.1f} ns/row, {N/t/1e6:.1f} M/s)")

# stage 4: bench-style heavy checksum
def join_heavy(p, b):
    res = hj.join(p, b, N, "inner")
    return (res.count.astype(jnp.int64) + jnp.sum(res.probe_idx.astype(jnp.int64))
            + jnp.sum(res.build_idx.astype(jnp.int64)))
t = timeit(jax.jit(join_heavy), probe, build)
print(f"full join (bench checksum): {t*1e3:.0f} ms ({N/t/1e6:.1f} M/s)")
