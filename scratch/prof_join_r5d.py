"""Third primitives round: sorted scatters, K=128 2-extract."""
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
plo, phi = split_i64(probe)
plo_i = jax.device_put(plo.view(jnp.int32))
phi_i = jax.device_put(phi.view(jnp.int32))
jax.block_until_ready(plo_i)

C1 = NP_ // 4
# sorted target indices (what an order-preserving compaction yields)
tgt_sorted = jax.device_put(
    jnp.sort(jax.random.randint(key, (C1,), 0, NP_, dtype=jnp.int32)))


def scatter(flags):
    @jax.jit
    def f(pl, tg):
        vals = pl[:C1]
        start = jnp.zeros((NP_ + 1,), jnp.int32).at[tg].set(
            vals, mode="drop", indices_are_sorted=flags)
        ln = jnp.zeros((NP_ + 1,), jnp.int32).at[tg].set(
            vals, mode="drop", indices_are_sorted=flags)
        return jnp.sum(start[:1024].astype(jnp.int64)) + \
            jnp.sum(ln[:1024].astype(jnp.int64))
    return f


timed("scatter2x np/4 sorted flags=False", scatter(False), plo_i, tgt_sorted)
timed("scatter2x np/4 sorted flags=True", scatter(True), plo_i, tgt_sorted)


# scatter the pair as one [C,2] AoS row scatter
@jax.jit
def scatter_aos(pl, tg):
    vals = jnp.stack([pl[:C1], pl[:C1]], axis=1)
    out = jnp.zeros((NP_ + 1, 2), jnp.int32).at[tg].set(
        vals, mode="drop", indices_are_sorted=True)
    return jnp.sum(out[:1024].astype(jnp.int64))


timed("scatter AoS[np/4,2] sorted", scatter_aos, plo_i, tgt_sorted)

hot64 = jnp.arange(1, 257, dtype=jnp.int64)
hlo, hhi = split_i64(hot64)
hlo_i, hhi_i = hlo.view(jnp.int32), hhi.view(jnp.int32)
hstart = jnp.arange(256, dtype=jnp.int32) * 7
hlen1 = jnp.full((256,), 2, jnp.int32)


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


timed("hot_bcast_K128(2 extracts)", hot_bcast(128), plo_i, phi_i)
timed("hot_bcast_K256(2 extracts)", hot_bcast(256), plo_i, phi_i)

# device-side hot-key detection cost (sample sort + runs + top_k)
STRIDE = max(1, NP_ // 65536)


@jax.jit
def detect(pl64):
    sample = pl64[::STRIDE][:65536]
    ss = lax.sort(sample)
    m = ss.shape[0]
    first = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
    iota = jnp.arange(m, dtype=jnp.int32)
    sp = jnp.where(first, iota, jnp.int32(m))
    nxt = lax.cummin(sp[::-1])[::-1]
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), m, jnp.int32)])
    cnt = jnp.where(first, nxt - iota, 0)
    top, idx = lax.top_k(cnt, 128)
    hk = ss[idx]
    return jnp.sum(hk) + jnp.sum(top.astype(jnp.int64))


timed("hot_detect(sample 64k, top128)", detect, jax.device_put(probe))
print("done")
