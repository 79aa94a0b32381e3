"""Profile the hash-aggregate components on the real TPU chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gandiva_tpu.ops.groupby import distinct_small
from gandiva_tpu.ops.hash_aggregate import hash_aggregate, segment_reduce

N = 16 * 1024 * 1024
G = 64

key = jax.random.PRNGKey(1)
keys = jax.random.randint(key, (N,), 0, G, dtype=jnp.int64) * 7 + 3
vals = jax.random.randint(key, (N,), -1000, 1000, dtype=jnp.int64)


def timeit(name, fn, *args, iters=5):
    r = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    # fetch-sync: pull one scalar to drain the tunnel pipeline
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        s = jax.tree.leaves(r)[0]
        float(jnp.asarray(s).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms   {N/dt/1e6:10.1f} Mrows/s")
    return dt


@jax.jit
def j_distinct(keys):
    gid, uniq, cnt, ov = distinct_small(keys, max_groups=G)
    return gid.sum(), uniq.sum(), cnt


@jax.jit
def j_distinct_full(keys):
    gid, uniq, cnt, ov = distinct_small(keys, max_groups=G)
    return gid, uniq, cnt


@jax.jit
def j_seg1(gid, vals):
    return segment_reduce(gid, vals, G + 1, "sum").sum()


@jax.jit
def j_seg4(gid, vals):
    a = segment_reduce(gid, vals, G + 1, "sum").sum()
    b = segment_reduce(gid, vals, G + 1, "count").sum()
    c = segment_reduce(gid, vals, G + 1, "min").sum()
    d = segment_reduce(gid, vals, G + 1, "max").sum()
    return a + b + c + d


@jax.jit
def j_full(keys, vals):
    res = hash_aggregate(keys, [("v", "sum"), ("v", "count"),
                                ("v", "min"), ("v", "max")],
                         {"v": (vals, None)}, max_groups=G)
    return (res["group_count"].astype(jnp.int64)
            + jnp.sum(res["agg:v:sum"]) + jnp.sum(res["agg:v:count"])
            + jnp.sum(res["agg:v:min"]) + jnp.sum(res["agg:v:max"]))


gid = j_distinct_full(keys)[0]
gid = jax.device_put(gid)

timeit("distinct_small (64 rounds)", j_distinct, keys)
timeit("segment_reduce sum x1", j_seg1, gid, vals)
timeit("segment_reduce sum+count+min+max", j_seg4, gid, vals)
timeit("full hash_aggregate", j_full, keys, vals)
