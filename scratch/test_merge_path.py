import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.kernels.merge_path import merge_sort_u32

rng = np.random.default_rng(0)
for n in [1000, 32768, 70000, 200000, 300001]:
    hi = rng.integers(0, 2**32, n, dtype=np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint32)
    pay = rng.integers(0, 2**32, n, dtype=np.uint32)
    # low-entropy duplicate-heavy case too
    if n == 70000:
        hi = (hi % 3).astype(np.uint32)
        lo = (lo % 5).astype(np.uint32)
    perm, slimbs, scarry = merge_sort_u32(
        [jnp.asarray(hi), jnp.asarray(lo)], [jnp.asarray(pay)],
        interpret=True)
    perm = np.asarray(perm)
    key = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
    exp = np.argsort(key, kind="stable")
    ok_perm = np.array_equal(perm, exp)
    ok_hi = np.array_equal(np.asarray(slimbs[0]), hi[exp])
    ok_lo = np.array_equal(np.asarray(slimbs[1]), lo[exp])
    ok_pay = np.array_equal(np.asarray(scarry[0]), pay[exp])
    print(n, "perm", ok_perm, "hi", ok_hi, "lo", ok_lo, "pay", ok_pay)
    assert ok_perm and ok_hi and ok_lo and ok_pay
print("ALL OK")
