import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.kernels.merge_path import merge_sort_u32

def timeit(f, *args, iters=3):
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

N = 100_000_000
rng = np.random.default_rng(42)
hi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
p1 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
p2 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

@jax.jit
def run(hi, lo, p1, p2):
    perm, sl, sc = merge_sort_u32([hi, lo], [p1, p2])
    return (sl[0][0].astype(jnp.int64) + sl[1][-1] + sc[0][0] + sc[1][-1]
            + perm[0])

t = timeit(run, hi, lo, p1, p2)
print(f"merge sort 100M (2 cmp + idx + 2 carry): {t*1e3:.0f} ms "
      f"({N/t/1e6:.1f} Mrows/s)")

# spot correctness at 4M on TPU (vs numpy)
M = 4_000_000
hi2, lo2, pp = hi[:M], lo[:M], p1[:M]
perm, sl, sc = merge_sort_u32([hi2, lo2], [pp])
perm = np.asarray(perm)
key = (np.asarray(hi2).astype(np.uint64) << np.uint64(32)) | np.asarray(lo2)
exp = np.argsort(key, kind="stable")
print("tpu 4M perm ok:", np.array_equal(perm, exp),
      "keys ok:", np.array_equal(np.asarray(sl[0]), np.asarray(hi2)[exp]),
      "carry ok:", np.array_equal(np.asarray(sc[0]), np.asarray(pp)[exp]))
