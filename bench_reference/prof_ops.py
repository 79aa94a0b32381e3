"""Real per-op TPU timing via device-side scan loops (tunnel-immune)."""
import sys, time, os
sys.path.insert(0, "/root/repo")
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_enable_x64", True)

N = int(os.environ.get("N", 16 * 1024 * 1024))
K = int(os.environ.get("K", 10))


def timed(name, f, *arrays, reduce_to_scalar=True):
    """Run f K times inside scan with perturbed first input; report ms/iter."""
    @partial(jax.jit, static_argnums=(len(arrays),))
    def run(*args):
        arrs, k = args[:-1], args[-1]
        def body(c, j):
            a0 = arrs[0] + j.astype(arrs[0].dtype) if arrs[0].dtype != jnp.bool_ else arrs[0]
            out = f(a0, *arrs[1:])
            s = sum(jnp.sum(o).astype(jnp.float64) for o in jax.tree_util.tree_leaves(out))
            return c + s, None
        tot, _ = lax.scan(body, jnp.float64(0), jnp.arange(k))
        return tot
    float(run(*arrays, 1))
    t0 = time.perf_counter(); float(run(*arrays, 1)); base = time.perf_counter() - t0
    float(run(*arrays, K + 1))
    t0 = time.perf_counter(); float(run(*arrays, K + 1)); tk = time.perf_counter() - t0
    ms = (tk - base) / K * 1e3
    print(f"{name:28s} {ms:8.3f} ms/iter   {N/ (ms/1e3) /1e6:10.0f} Mrows/s")


key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
a64 = jax.random.randint(k1, (N,), 0, 1000, dtype=jnp.int64)
a32 = a64.astype(jnp.int32)
b64 = jax.random.uniform(k2, (N,), dtype=jnp.float64)
b32 = b64.astype(jnp.float32)
mask = a32 > 500
jax.block_until_ready((a64, a32, b64, b32, mask))

timed("mask int64>500", lambda a: a > 500, a64)
timed("mask int32>500", lambda a: a > 500, a32)
timed("proj f64 b*2+a", lambda a, b: b * 2.0 + a.astype(jnp.float64), a64, b64)
timed("proj f32 b*2+a", lambda a, b: b * 2.0 + a.astype(jnp.float32), a32, b32)
timed("cumsum i32", lambda a: jnp.cumsum((a > 500).astype(jnp.int32)), a32)
timed("sum i32", lambda a: jnp.sum((a > 500).astype(jnp.int32)), a32)

def compact(a):
    m = a > 500
    inc = m.astype(jnp.int32)
    pos = jnp.cumsum(inc) - inc
    src = jnp.arange(N, dtype=jnp.uint32)
    slot = jnp.where(m, pos, N)
    return jnp.zeros((N + 1,), jnp.uint32).at[slot].set(src, mode="drop")[:N]

timed("compact (cumsum+scatter)", compact, a32)
timed("scatter only", lambda a: jnp.zeros((N + 1,), jnp.uint32).at[
    jnp.clip(a.astype(jnp.int32), 0, N)].set(jnp.arange(N, dtype=jnp.uint32), mode="drop"), a32)
timed("gather f64 by idx", lambda a, b: b[jnp.clip(a.astype(jnp.int32), 0, N - 1)], a32, b64)
timed("gather f32 by idx", lambda a, b: b[jnp.clip(a.astype(jnp.int32), 0, N - 1)], a32, b32)
timed("argsort-free sort u32", lambda a: jnp.sort(a.astype(jnp.uint32)), a32)
print("done")
