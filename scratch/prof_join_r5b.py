"""Primitive costs for the r5 probe redesign (run serially on TPU)."""
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
    print(f"{name:38s} {per*1e3:9.1f} ms  {per/NP_*1e9:7.2f} ns/row  "
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

hot64 = jnp.arange(1, 129, dtype=jnp.int64)
hlo, hhi = split_i64(hot64)
hlo_i, hhi_i = hlo.view(jnp.int32), hhi.view(jnp.int32)
hstart = jnp.arange(128, dtype=jnp.int32) * 7
hlen = jnp.ones((128,), jnp.int32)


def hot_resolve(K):
    @jax.jit
    def f(pl, ph):
        eq = (pl[:, None] == hlo_i[None, :K]) \
            & (ph[:, None] == hhi_i[None, :K])
        is_hot = eq.any(axis=1)
        st = jnp.sum(jnp.where(eq, hstart[None, :K], 0), axis=1)
        ln = jnp.sum(jnp.where(eq, hlen[None, :K], 0), axis=1)
        return (jnp.sum(is_hot.astype(jnp.int64))
                + jnp.sum(st.astype(jnp.int64))
                + jnp.sum(ln.astype(jnp.int64)))
    return f


timed("hot_bcast_K128(2limb eq + 2 extract)", hot_resolve(128), plo_i, phi_i)
timed("hot_bcast_K32", hot_resolve(32), plo_i, phi_i)


# one-hot MXU variant: eq as f32 matmul against [K, 2] value matrix
@jax.jit
def hot_mxu(pl, ph):
    eq = ((pl[:, None] == hlo_i[None, :]) &
          (ph[:, None] == hhi_i[None, :])).astype(jnp.float32)   # [np,128]
    vals = jnp.stack([hstart, hlen], axis=1).astype(jnp.float32)  # [128,2]
    out = eq @ vals                                              # [np,2] MXU
    is_hot = eq.max(axis=1) > 0
    return (jnp.sum(is_hot.astype(jnp.int64))
            + jnp.sum(out[:, 0].astype(jnp.int64))
            + jnp.sum(out[:, 1].astype(jnp.int64)))


timed("hot_mxu_K128(eq matmul)", hot_mxu, plo_i, phi_i)


# compact with 3 payload lanes at ~20% density
from gandiva_tpu.ops.compaction import compact_best
from gandiva_tpu.ops.kernels.compaction_pallas import BLOCK

npad = ((NP_ + BLOCK - 1) // BLOCK) * BLOCK


@jax.jit
def compact3(pl, ph):
    mask = pl > 128  # cold rows (~19% for this zipf)
    h = pl ^ ph

    def pad(x, fill=0):
        if npad == NP_:
            return x
        return jnp.concatenate(
            [x, jnp.full((npad - NP_,), fill, x.dtype)])
    idx, cnt, packed = compact_best(pad(mask),
                                    [pad(h), pad(pl), pad(ph)])
    return (cnt.astype(jnp.int64) + jnp.sum(idx[:1024].astype(jnp.int64))
            + jnp.sum(packed[0][:1024].astype(jnp.int64)))


timed("compact_mask+3payloads(19%)", compact3, plo_i, phi_i)


@jax.jit
def cumsum_np(pl):
    c = jnp.cumsum((pl > 128).astype(jnp.int32))
    return c[-1].astype(jnp.int64) + c[0].astype(jnp.int64)


timed("cumsum_i32", cumsum_np, plo_i)

# gather at np/4 width from a 1GB table
T_ROWS = 64 * 1024 * 1024
table = jax.device_put(jnp.zeros((T_ROWS, 4), jnp.int32))
C1 = NP_ // 4


@jax.jit
def gather_quarter(pl, tbl):
    h = (pl.view(jnp.uint32) % jnp.uint32(T_ROWS)).astype(jnp.int32)[:C1]
    got = tbl[h]
    return jnp.sum(got[:, 2].astype(jnp.int64)) + \
        jnp.sum((got[:, 0] == pl[:C1]).astype(jnp.int64))


timed("r1_gather@np/4", gather_quarter, plo_i, table)


# scatter-back: C1 values into np-wide arrays
tgt = jax.device_put(jnp.arange(C1, dtype=jnp.int32) * 3 % NP_)


@jax.jit
def scatterback(pl):
    vals = pl[:C1]
    start = jnp.zeros((NP_ + 1,), jnp.int32).at[tgt].set(vals, mode="drop")
    ln = jnp.zeros((NP_ + 1,), jnp.int32).at[tgt].set(vals, mode="drop")
    return jnp.sum(start[:1024].astype(jnp.int64)) + \
        jnp.sum(ln[:1024].astype(jnp.int64))


timed("scatterback 2x(np/4 -> np)", scatterback, plo_i)


# zero-iteration full-width while_loop (the fallback machinery cost)
@jax.jit
def zero_loop(pl, ph, tbl):
    unres = jnp.zeros((NP_,), bool)
    start = pl * 0
    ln = ph * 0

    def cond(s):
        i, _, _, _, u = s
        return jnp.logical_and(i < 100, u.any())

    def body(s):
        i, pos, st, l_, u = s
        g = tbl[jnp.where(u, pos, 0)]
        hit = u & (g[:, 3] > 0)
        return (i + 1, pos + 1, jnp.where(hit, g[:, 2], st),
                jnp.where(hit, g[:, 3], l_), u & ~hit)

    _, _, start, ln, _ = lax.while_loop(
        cond, body, (jnp.int32(0), pl.view(jnp.int32) % jnp.int32(T_ROWS),
                     start, ln, unres))
    return jnp.sum(start[:1024].astype(jnp.int64)) + \
        jnp.sum(ln[:1024].astype(jnp.int64))


timed("zero-iter fullwidth while_loop", zero_loop, plo_i, phi_i, table)
print("done")
