import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from gandiva_tpu.ops.kernels import merge_path as mp

rng = np.random.default_rng(0)
n = 70000
hi = rng.integers(0, 2**32, n, dtype=np.uint32)   # distinct-ish keys
lo = rng.integers(0, 2**32, n, dtype=np.uint32)
perm, slimbs, _ = mp.merge_sort_u32([jnp.asarray(hi), jnp.asarray(lo)],
                                    interpret=True)
perm = np.asarray(perm)
key = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
exp = np.argsort(key, kind="stable")
print("distinct keys ok:", np.array_equal(perm, exp))
bad = np.nonzero(perm != exp)[0]
print("first bad out positions:", bad[:10], "of", len(bad))
if len(bad):
    i = bad[0]
    print("around:", i, "got", perm[i-2:i+3], "exp", exp[i-2:i+3])
    sk = np.sort(key)
    gotk = key[perm[i-2:i+3]]
    print("got keys sortedness:", gotk, "expected", sk[i-2:i+3])
