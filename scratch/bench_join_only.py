import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.hash_join import join

N, NB = 100_000_000, 1_000_000
@jax.jit
def run(probe, build):
    res = join(probe, build, N, "inner")
    return (res.count.astype(jnp.int64)
            + jnp.sum(res.probe_idx.astype(jnp.int64))
            + jnp.sum(res.build_idx.astype(jnp.int64))
            + jnp.where(res.overflow, jnp.int64(-1), 0))
key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (N,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0/0.3)).astype(jnp.int64) % NB
build = jnp.arange(NB, dtype=jnp.int64)
import time as _t
t0=_t.perf_counter()
int(run(probe, build))
print(f"first call (compile+run): {_t.perf_counter()-t0:.0f} s", flush=True)
best = 1e9
for _ in range(3):
    t0=time.perf_counter(); int(run(probe, build)); best=min(best, time.perf_counter()-t0)
print(f"general join (unique data): {best*1e3:.0f} ms ({N/best/1e6:.1f} Mrows/s)")

# correctness vs numpy at 4M
M = 4_000_000
p2 = probe[:M]
res = jax.jit(lambda p, b: join(p, b, M, "inner"))(p2, build)
cnt = int(res.count)
pi = np.asarray(res.probe_idx)[:cnt]; bi = np.asarray(res.build_idx)[:cnt]
pk = np.asarray(p2)
assert cnt == M, (cnt, M)
assert np.array_equal(pk[pi], np.asarray(build)[bi])
assert np.array_equal(np.sort(pi), np.arange(M))
print("4M correctness ok")

# duplicate-build (general expansion) correctness at 2M x 100k with dups
rng = np.random.default_rng(1)
bdup = jnp.asarray(rng.integers(0, 50_000, 100_000).astype(np.int64))
pd = jnp.asarray(rng.integers(0, 50_000, 2_000_000).astype(np.int64))
res2 = jax.jit(lambda p, b: join(p, b, 2_000_000*45, "inner"))(pd, bdup)
cnt2 = int(res2.count); ov = bool(res2.overflow)
import collections
cb = collections.Counter(np.asarray(bdup).tolist())
exp_total = sum(cb[k] for k in np.asarray(pd).tolist())
print("dup-build total ok:", cnt2 == exp_total and not ov, cnt2, exp_total)
