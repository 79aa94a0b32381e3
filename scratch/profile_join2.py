"""Round counts + per-loop timing inside _hash_probe_ranges."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax

from gandiva_tpu.ops.sort import SortKey, _sort_full, normalize_key
from gandiva_tpu.utils.bits import split_i64
from gandiva_tpu.utils.hashing import hash32
from gandiva_tpu.ops.groupby import table_size_for
from gandiva_tpu.utils import shard_compat

N = int(os.environ.get("N", 16 * 1024 * 1024))
NB = 1024 * 1024
W = 4

key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (N,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0 / 0.3)).astype(jnp.int64) % NB
build = jnp.arange(NB, dtype=jnp.int64)

perm, (sorted_norm,) = jax.jit(
    lambda b: _sort_full([SortKey(b)], None))(build)
pk_norm = jax.jit(normalize_key)(probe)
n_valid = NB

nb = NB
np_ = N
T = table_size_for(nb, 8)
print("T =", T, "NB_ =", T // W)


@jax.jit
def build_table(sorted_norm):
    sk64 = sorted_norm.astype(jnp.int64)
    slo, shi = split_i64(sk64)
    slo_i, shi_i = slo.view(jnp.int32), shi.view(jnp.int32)
    iota = jnp.arange(nb, dtype=jnp.int32)
    valid = iota < n_valid
    prev_ne = jnp.concatenate([jnp.ones((1,), bool), sk64[1:] != sk64[:-1]])
    is_start = valid & prev_ne
    start_pos = jnp.where(is_start, iota, jnp.int32(nb))
    nxt = lax.cummin(start_pos[::-1])[::-1]
    nxt = jnp.concatenate([nxt[1:], jnp.full((1,), nb, jnp.int32)])
    run_len = (jnp.minimum(nxt, jnp.asarray(n_valid).astype(jnp.int32))
               - iota)
    NB_ = T // W
    h0 = ((hash32(sk64) % jnp.uint32(NB_)).astype(jnp.int32) * jnp.int32(W))
    table = jnp.zeros((T + 1, 4), dtype=jnp.int32)
    rows = jnp.stack([slo_i, shi_i, iota, run_len], axis=1)

    def bcond(state):
        i, _, _, unresolved = state
        return jnp.logical_and(i < T, unresolved.any())

    def bbody(state):
        i, pos, table, unresolved = state
        slot = jnp.where(unresolved, pos, T)
        occ = table[slot, 3] > 0
        claim = unresolved & ~occ
        table = table.at[jnp.where(claim, slot, T)].set(rows, mode="drop")
        got = table[slot]
        settled = unresolved & (got[:, 3] > 0) \
            & (got[:, 0] == slo_i) & (got[:, 1] == shi_i)
        return (i + 1, (pos + 1) % T, table, unresolved & ~settled)

    i, _, table, _ = shard_compat.while_loop(
        bcond, bbody, (jnp.int32(0), h0, table, is_start))
    return i, table


@jax.jit
def probe_loop(table, pk_norm):
    NB_ = T // W
    table_wide = table[:T].reshape(NB_, W * 4)
    pk64 = pk_norm.astype(jnp.int64)
    plo, phi = split_i64(pk64)
    plo_i, phi_i = plo.view(jnp.int32), phi.view(jnp.int32)
    h0p = (hash32(pk64) % jnp.uint32(NB_)).astype(jnp.int32)

    def pcond(state):
        i, _, _, _, unresolved = state
        return jnp.logical_and(i < jnp.int32(NB_), unresolved.any())

    def pbody(state):
        i, bkt, start, ln, unresolved = state
        win = table_wide[jnp.where(unresolved, bkt, 0)]
        hit_any = jnp.zeros((np_,), bool)
        empty_any = jnp.zeros((np_,), bool)
        for j in range(W):
            occ_j = win[:, 4 * j + 3] > 0
            hit_j = occ_j & (win[:, 4 * j] == plo_i) \
                & (win[:, 4 * j + 1] == phi_i)
            take = unresolved & hit_j & ~hit_any
            start = jnp.where(take, win[:, 4 * j + 2], start)
            ln = jnp.where(take, win[:, 4 * j + 3], ln)
            hit_any = hit_any | hit_j
            empty_any = empty_any | ~occ_j
        unresolved = unresolved & ~hit_any & ~empty_any
        return (i + 1, (bkt + 1) % jnp.int32(NB_), start, ln, unresolved)

    i, _, start, ln, _ = shard_compat.while_loop(
        pcond, pbody, (jnp.int32(0), h0p, jnp.zeros((np_,), jnp.int32),
                       jnp.zeros((np_,), jnp.int32), jnp.ones((np_,), bool)))
    return i, start.sum(), ln.sum()


def timeit(name, fn, *args, iters=3):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:25s} {dt*1e3:9.1f} ms")
    return r

bi, table = timeit("build loop", build_table, sorted_norm)
print("build rounds:", int(bi))
pi, s, l = timeit("probe loop", probe_loop, table, pk_norm)
print("probe rounds:", int(pi))
