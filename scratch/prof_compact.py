import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.kernels.compaction_pallas import compact_pallas_u32

def timeit(f, *args, iters=5):
    float(f(*args)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

N = 16 * 1024 * 1024
rng = np.random.default_rng(0)
mask = jnp.asarray(rng.random(N) < 0.5)
pls = [jnp.asarray(rng.integers(0, 2**31, N, dtype=np.int32)) for _ in range(5)]

for k in (1, 2, 4, 5):
    f = jax.jit(lambda m, *ps: sum(p[0] + p[-1] for p in
        compact_pallas_u32(m, list(ps))[0]))
    t = timeit(f, mask, *pls[:k])
    print(f"payloads={k}: {t*1e3:.1f} ms ({N/t/1e6:.0f} M/s)")

for rows in (16, 32, 64, 128):
    f = jax.jit(lambda m, *ps, _r=rows: sum(p[0] + p[-1] for p in
        compact_pallas_u32(m, list(ps), rows_per_block=_r)[0]))
    t = timeit(f, mask, *pls[:4])
    print(f"rows_per_block={rows} (4 payloads): {t*1e3:.1f} ms ({N/t/1e6:.0f} M/s)")

for rows in (256, 512):
    try:
        f = jax.jit(lambda m, *ps, _r=rows: sum(p[0] + p[-1] for p in
            compact_pallas_u32(m, list(ps), rows_per_block=_r)[0]))
        t = timeit(f, mask, *pls[:4])
        print(f"rows_per_block={rows} (4 payloads): {t*1e3:.1f} ms ({N/t/1e6:.0f} M/s)")
    except Exception as e:
        print(f"rows={rows} FAILED {str(e)[:120]}")
