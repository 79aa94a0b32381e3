"""Variants for the segment-reduce hot path: 32-bit limb accumulation."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

N = 16 * 1024 * 1024
G = 128

key = jax.random.PRNGKey(1)
keys = jax.random.randint(key, (N,), 0, 64, dtype=jnp.int64) * 7 + 3
vals = jax.random.randint(key, (N,), -1000, 1000, dtype=jnp.int64)
gid32 = (keys % 64).astype(jnp.int32)


def timeit(name, fn, *args, iters=5):
    r = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        float(jnp.asarray(jax.tree.leaves(r)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms   {N/dt/1e6:10.1f} Mrows/s")


groups = jnp.arange(G, dtype=jnp.int32)


@jax.jit
def count_only(gid):
    member = gid[:, None] == groups[None, :]
    return jnp.sum(member.astype(jnp.int32), axis=0).sum()


@jax.jit
def sum_limbs(gid, vals):
    member = (gid[:, None] == groups[None, :]).astype(jnp.int32)
    lo = (vals & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    l0 = (lo & jnp.uint32(0xFFFF)).astype(jnp.int32)
    l1 = (lo >> jnp.uint32(16)).astype(jnp.int32)
    hi = ((vals >> 32) & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    l2 = (hi & jnp.uint32(0xFFFF)).astype(jnp.int32)
    l3 = (hi >> jnp.uint32(16)).astype(jnp.int32)
    # per-limb i64 accumulate (i32 would overflow at 16M rows; the compare
    # is i32 and the multiply is i32 — only the reduce accumulator widens)
    s = [jnp.sum(member * l[:, None], axis=0, dtype=jnp.int64) for l in
         (l0, l1, l2, l3)]
    total = (s[0] + (s[1] << 16) + ((s[2] + (s[3] << 16)) << 32))
    return total.sum()


@jax.jit
def sum_limbs_blocked(gid, vals):
    """Block the N axis so per-block limb sums fit i32, then widen once."""
    B = 8192
    nb = N // B
    member = (gid[:, None] == groups[None, :])
    lo = (vals & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    l0 = (lo & jnp.uint32(0xFFFF)).astype(jnp.int32)
    l1 = (lo >> jnp.uint32(16)).astype(jnp.int32)
    hi = ((vals >> 32) & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    l2 = (hi & jnp.uint32(0xFFFF)).astype(jnp.int32)
    l3 = (hi >> jnp.uint32(16)).astype(jnp.int32)
    m = member.reshape(nb, B, G)
    out = []
    for l in (l0, l1, l2, l3):
        blk = jnp.sum(m * l.reshape(nb, B, 1), axis=1)      # [nb, G] i32
        out.append(jnp.sum(blk, axis=0, dtype=jnp.int64))   # [G] i64
    s = out
    total = (s[0] + (s[1] << 16) + ((s[2] + (s[3] << 16)) << 32))
    return total.sum()


@jax.jit
def minmax_biased(gid, vals):
    member = gid[:, None] == groups[None, :]
    vhi = (vals >> 32).astype(jnp.int32)                     # signed hi
    vlo = ((vals & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
           ^ jnp.uint32(0x80000000)).astype(jnp.int32)       # biased lo
    I32MAX = jnp.int32(2**31 - 1)
    mhi = jnp.min(jnp.where(member, vhi[:, None], I32MAX), axis=0)
    tie = member & (vhi[:, None] == mhi[None, :])
    mlo = jnp.min(jnp.where(tie, vlo[:, None], I32MAX), axis=0)
    mn = (mhi.astype(jnp.int64) << 32) | (
        (mlo ^ jnp.int32(-2**31)).astype(jnp.uint32).astype(jnp.int64))
    return mn.sum()


@jax.jit
def onehot_dot(gid, vals):
    """MXU path: one-hot f32 [N, G] contracted against 16-bit limbs."""
    oh = (gid[:, None] == groups[None, :]).astype(jnp.float32)
    lo = (vals & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = ((vals >> 32) & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    limbs = jnp.stack([
        (lo & jnp.uint32(0xFFFF)).astype(jnp.float32),
        (lo >> jnp.uint32(16)).astype(jnp.float32),
        (hi & jnp.uint32(0xFFFF)).astype(jnp.float32),
        (hi >> jnp.uint32(16)).astype(jnp.float32)], axis=1)  # [N, 4]
    B = 2048
    nb = N // B
    part = jax.lax.dot_general(
        oh.reshape(nb, B, G), limbs.reshape(nb, B, 4),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)                 # [nb, G, 4]
    s = jnp.sum(part.astype(jnp.int64), axis=0)              # exact ≤2^27
    total = (s[:, 0] + (s[:, 1] << 16) + ((s[:, 2] + (s[:, 3] << 16)) << 32))
    return total.sum()


timeit("count only (i32 member sum)", count_only, gid32)
timeit("sum via 4 i32 limbs (i64 acc)", sum_limbs, gid32, vals)
timeit("sum via 4 i32 limbs (blocked i32)", sum_limbs_blocked, gid32, vals)
timeit("min via (hi,lo) biased pairs", minmax_biased, gid32, vals)
timeit("sum via one-hot MXU dot", onehot_dot, gid32, vals)
