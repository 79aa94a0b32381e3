import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from gandiva_tpu.ops.hash_join import join
rng = np.random.default_rng(2)
M, NB = 4_000_000, 300_000
probe = jnp.asarray(rng.integers(0, 500_000, M).astype(np.int64))
build = jnp.asarray(rng.permutation(500_000)[:NB].astype(np.int64))
res = jax.jit(lambda p, b: join(p, b, M, "inner"))(probe, build)
cnt = int(res.count)
pi = np.asarray(res.probe_idx)[:cnt]; bi = np.asarray(res.build_idx)[:cnt]
pk, bk = np.asarray(probe), np.asarray(build)
assert np.array_equal(pk[pi], bk[bi])
inset = np.isin(pk, bk)
assert cnt == int(inset.sum())
assert np.array_equal(np.sort(pi), np.nonzero(inset)[0])
print("4M x 300k TPU join correctness ok:", cnt, "matches")
