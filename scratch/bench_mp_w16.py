import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.kernels.merge_path import merge_sort_u32

def timeit(f, *args, iters=3):
    float(f(*args)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

N = 100_000_000
rng = np.random.default_rng(42)
hi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
p1 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
p2 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

for w in (17,):
    @jax.jit
    def run(hi, lo, p1, p2, _w=w):
        perm, sl, sc = merge_sort_u32([hi, lo], [p1, p2], w_log2=_w)
        return (sl[0][0].astype(jnp.int64) + sl[1][-1] + sc[0][0]
                + sc[1][-1] + perm[0])
    try:
        t = timeit(run, hi, lo, p1, p2)
        print(f"W=2^{w}: {t*1e3:.0f} ms ({N/t/1e6:.1f} Mrows/s)")
    except Exception as e:
        print(f"W=2^{w}: FAILED {str(e)[:200]}")
