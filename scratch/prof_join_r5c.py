"""Second round of probe-redesign primitives (serial TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NP_ = int(os.environ.get("NPROBE", 100_000_000))
ITERS = int(os.environ.get("ITERS", 3))


def timed(name, fn, *args):
    t0 = time.perf_counter()
    r = int(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = int(fn(*args))
    per = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {per*1e3:9.1f} ms  {per/NP_*1e9:7.2f} ns/row  "
          f"(compile {compile_s:.0f}s)  chk={r & 0xffff}", flush=True)
    return per


key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (NP_,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0 / 0.3)).astype(jnp.int64) % (1 << 20)
from gandiva_tpu.utils.bits import split_i64
from gandiva_tpu.utils.hashing import hash32
plo, phi = split_i64(probe)
plo_i = jax.device_put(plo.view(jnp.int32))
phi_i = jax.device_put(phi.view(jnp.int32))
jax.block_until_ready(plo_i)

hot64 = jnp.arange(1, 129, dtype=jnp.int64)
hlo, hhi = split_i64(hot64)
hlo_i, hhi_i = hlo.view(jnp.int32), hhi.view(jnp.int32)
hstart = jnp.arange(128, dtype=jnp.int32) * 7
hlen1 = jnp.ones((128,), jnp.int32) + 1   # len+1 encoding


def hot_bcast(K):
    @jax.jit
    def f(pl, ph):
        eq = (pl[:, None] == hlo_i[None, :K]) \
            & (ph[:, None] == hhi_i[None, :K])
        st = jnp.sum(jnp.where(eq, hstart[None, :K], 0), axis=1)
        lnp1 = jnp.sum(jnp.where(eq, hlen1[None, :K], 0), axis=1)
        return (jnp.sum((lnp1 > 0).astype(jnp.int64))
                + jnp.sum(st.astype(jnp.int64))
                + jnp.sum(lnp1.astype(jnp.int64)))
    return f


def hot_mxu(K):
    @jax.jit
    def f(pl, ph):
        eq = ((pl[:, None] == hlo_i[None, :K]) &
              (ph[:, None] == hhi_i[None, :K])).astype(jnp.float32)
        vals = jnp.stack([hstart[:K], hlen1[:K]], axis=1).astype(jnp.float32)
        out = eq @ vals
        lnp1 = out[:, 1].astype(jnp.int32)
        return (jnp.sum((lnp1 > 0).astype(jnp.int64))
                + jnp.sum(out[:, 0].astype(jnp.int64))
                + jnp.sum(lnp1.astype(jnp.int64)))
    return f


timed("hot_bcast_K64(2 extracts)", hot_bcast(64), plo_i, phi_i)
timed("hot_mxu_K64", hot_mxu(64), plo_i, phi_i)
timed("hot_bcast_K32b", hot_bcast(32), plo_i, phi_i)
timed("hot_mxu_K32", hot_mxu(32), plo_i, phi_i)

# uniform-hash gather at np/4 and np/2 from a 1 GB table (16B AoS rows)
T = 64 * 1024 * 1024
table = jax.device_put(jnp.zeros((T + (1 << 20), 4), jnp.int32))
h_uniform = (hash32(probe) % jnp.uint32(T)).astype(jnp.int32)
jax.block_until_ready(h_uniform)


def gather_width(C):
    @jax.jit
    def f(h, tbl):
        got = tbl[h[:C]]
        return (jnp.sum(got[:, 2].astype(jnp.int64))
                + jnp.sum(got[:, 3].astype(jnp.int64)))
    return f


timed("gather16B@np/4 uniform", gather_width(NP_ // 4), h_uniform, table)
timed("gather16B@np/2 uniform", gather_width(NP_ // 2), h_uniform, table)
timed("gather16B@np uniform", gather_width(NP_), h_uniform, table)
print("done")
