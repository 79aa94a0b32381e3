"""Phase-level profile of the general join path on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gandiva_tpu.ops.hash_join import join, _hash_probe_ranges
from gandiva_tpu.ops.sort import SortKey, _sort_full, normalize_key

N = int(os.environ.get("N", 16 * 1024 * 1024))
NB = 1024 * 1024

key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (N,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0 / 0.3)).astype(jnp.int64) % NB
build = jnp.arange(NB, dtype=jnp.int64)
probe, build = jax.block_until_ready((probe, build))


def timeit(name, fn, *args, iters=3):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:9.1f} ms")
    return r


@jax.jit
def phase_sort(build):
    perm, (sk,) = _sort_full([SortKey(build)], None)
    return perm, sk

@jax.jit
def phase_probe(probe, sk):
    pk = normalize_key(probe)
    lo, ln = _hash_probe_ranges(pk, sk, NB, jnp.ones((N,), bool))
    return lo.sum(), ln.sum()

@jax.jit
def phase_full(probe, build):
    res = join(probe, build, N, "inner")
    return res.count + res.probe_idx.sum() + res.build_idx.sum()

perm, sk = timeit("build sort (1M)", phase_sort, build)
timeit("hash_probe_ranges", phase_probe, probe, sk)
timeit("full join", phase_full, probe, build)
