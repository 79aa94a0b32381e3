import time
import jax, jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.kernels import merge_path as mp
from gandiva_tpu.ops.kernels.sort_bitonic import _run_block_stages, _stage_pairs_leaf

def timeit(f, *args, iters=3):
    float(f(*args)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

N = 100_000_000
W = 1 << 15
nw = ((N + W - 1)//W)*W
total = nw + 2*W
rng = np.random.default_rng(42)
vals = [jnp.asarray(rng.integers(-2**31, 2**31, total, dtype=np.int32))
        for _ in range(5)]

leaf = jax.jit(lambda vs: sum(v[0] + v[-1] for v in
    _run_block_stages(vs, _stage_pairs_leaf(15), 15, False, num_cmp=3, local_dirs=True)))
t = timeit(leaf, vals)
print(f"leaf (5 limbs, cmp 3): {t*1e3:.0f} ms")

# one merge round (round 0 meta)
def one_round(vs):
    meta = mp._round_meta(vs, 3, nw, 15, 0)
    out = mp._merge_round(vs, meta, 3, 15, False)
    return sum(v[0] + v[-1] for v in out)
t = timeit(jax.jit(one_round), vals)
print(f"one merge round incl search: {t*1e3:.0f} ms")

# search only
def search_only(vs):
    meta = mp._round_meta(vs, 3, nw, 15, 0)
    return meta[0,0] + meta[-1,-1]
t = timeit(jax.jit(search_only), vals)
print(f"search only: {t*1e3:.0f} ms")
