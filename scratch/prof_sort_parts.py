import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.kernels.sort_bitonic import (
    _run_block_stages, _stage_pairs_leaf, _stage_pairs_finish, _xla_stage)

def timeit(f, *args, iters=3):
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

N = 1 << 27   # 134M
rng = np.random.default_rng(42)
vals = [jnp.asarray(rng.integers(-2**31, 2**31, N, dtype=np.int32))
        for _ in range(3)]
w = 15
def red(outs):
    return sum(o[0].astype(jnp.int64) + o[-1] for o in outs)
leaf = jax.jit(lambda vs: red(_run_block_stages(vs, _stage_pairs_leaf(w), w, False)))
t = timeit(leaf, vals)
print(f"leaf sort (W=32k, 3 limbs, {N>>20}M): {t*1e3:.0f} ms ({N/t/1e6:.0f} M/s)")

vals5 = vals + [v for v in vals[:2]]
leaf5 = jax.jit(lambda vs: red(_run_block_stages(vs, _stage_pairs_leaf(w), w, False)))
t = timeit(leaf5, vals5)
print(f"leaf sort (W=32k, 5 limbs): {t*1e3:.0f} ms ({N/t/1e6:.0f} M/s)")

fin = jax.jit(lambda vs: red(_run_block_stages(vs, _stage_pairs_finish(16, w), w, False)))
t = timeit(fin, vals)
print(f"finish pass (15 stages, 3 limbs): {t*1e3:.0f} ms ({N/t/1e6:.0f} M/s)")

xs = jax.jit(lambda vs: red(_xla_stage(vs, 20, 18)))
t = timeit(xs, vals)
print(f"one XLA stage (3 limbs): {t*1e3:.0f} ms ({N/t/1e6:.0f} M/s)")
