"""Stage-wise cost of the new hot probe at 16M (fast compiles)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gandiva_tpu.ops.hash_join import (build_join_table, probe_chunk, join,
                                       _probe_ranges_hot,
                                       _probe_ranges_dense)
from gandiva_tpu.ops.sort import normalize_key

NP = int(os.environ.get("NPROBE", 16 * 1024 * 1024))
NB = 1 << 20
ITERS = int(os.environ.get("ITERS", 3))

key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (NP,), minval=1e-5, maxval=1.0)
probe = (u ** (-1.0 / 0.3)).astype(jnp.int64) % NB
build = jnp.arange(NB, dtype=jnp.int64)
jax.block_until_ready(probe)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    r = int(fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = int(fn(*args))
    per = (time.perf_counter() - t0) / ITERS
    print(f"{name:30s} {per*1e3:9.1f} ms  {per/NP*1e9:7.2f} ns/row "
          f"(compile {c:.0f}s) chk={r & 0xffff}", flush=True)


@jax.jit
def jt_only(b):
    jt = build_join_table(b)
    return jnp.sum(jt.table[:1024].astype(jnp.int64)) + jt.n_build_valid


timed("build_table", jt_only, build)


def probe_checks(fn):
    @jax.jit
    def f(p, b):
        jt = build_join_table(b)
        pk = normalize_key(p)
        kv = jnp.ones((NP,), bool)
        s, l, d = fn(jt.table, NB, pk, kv)
        return (jnp.sum(s.astype(jnp.int64)) + jnp.sum(l.astype(jnp.int64))
                + d["fallback_rows"].astype(jnp.int64) * 1000003)
    return f


timed("probe_hot(full)", probe_checks(
    lambda t, nb, pk, kv: _probe_ranges_hot(t, nb, pk, kv, 128)),
    probe, build)
timed("probe_dense", probe_checks(
    lambda t, nb, pk, kv: _probe_ranges_dense(t, nb, pk, kv)),
    probe, build)


@jax.jit
def full_join_new(p, b):
    res = join(p, b, NP, "inner")
    return (res.count.astype(jnp.int64)
            + jnp.sum(res.probe_idx.astype(jnp.int64))
            + jnp.sum(res.build_idx.astype(jnp.int64)))


timed("full_join(hot)", full_join_new, probe, build)
print("done")
