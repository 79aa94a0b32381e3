"""Fragnet vs masked-store compaction on real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gandiva_tpu.ops.kernels import compaction_pallas as cp

N = int(os.environ.get("N", 64 * 1024 * 1024))
ITERS = int(os.environ.get("ITERS", 5))
DENS = float(os.environ.get("DENS", 0.5))

key = jax.random.PRNGKey(0)
mask = jax.random.uniform(key, (N,)) < DENS
pay = [jax.random.randint(key, (N,), 0, 2**31, dtype=jnp.int32)
       for _ in range(int(os.environ.get("NPAY", 2)))]
mask, pay = jax.device_put(mask), [jax.device_put(p) for p in pay]
jax.block_until_ready(mask)

def timed(name, fn):
    t0 = time.perf_counter(); r = int(fn()); c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = int(fn())
    per = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {per*1e3:8.1f} ms  {N/per/1e6:7.0f} Mrows/s  (compile {c:.0f}s) chk={r & 0xffff}", flush=True)

import functools
for rows in (64, 128, 256, 512, 1024):
    if N % (rows * 128):
        continue
    @functools.partial(jax.jit, static_argnums=2)
    def f_frag(m, ps, rows):
        packed, cnt = cp.compact_pallas_u32_fragnet(m, list(ps), rows_per_block=rows)
        return cnt.astype(jnp.int64) + jnp.sum(packed[0][:1024].astype(jnp.int64))
    try:
        timed(f"fragnet rows={rows}", lambda r=rows: f_frag(mask, tuple(pay), r))
    except Exception as e:
        print(f"fragnet rows={rows} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

@jax.jit
def f_old(m, ps):
    packed, cnt = cp.compact_pallas_u32(m, list(ps), rows_per_block=64)
    return cnt.astype(jnp.int64) + jnp.sum(packed[0][:1024].astype(jnp.int64))
timed("masked-store rows=64", lambda: f_old(mask, tuple(pay)))

# correctness on-device
@jax.jit
def check(m, ps):
    p1, c1 = cp.compact_pallas_u32_fragnet(m, list(ps), rows_per_block=64)
    p2, c2 = cp.compact_pallas_u32(m, list(ps), rows_per_block=64)
    live = jnp.arange(N) < c1
    eq = (c1 == c2)
    for a, b in zip(p1, p2):
        eq = eq & jnp.all(jnp.where(live, a[:N] == b[:N], True))
    return eq.astype(jnp.int64)
print("fragnet==masked-store:", int(check(mask, tuple(pay))), flush=True)
print("done")
