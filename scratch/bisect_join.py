import time, sys
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from gandiva_tpu.ops.compaction import compact_best

mode = sys.argv[1]
N = 1 << 20

mask = jnp.asarray(np.random.default_rng(0).random(N) < 0.5)
pay = jnp.arange(N, dtype=jnp.int32)

if mode == "cond_pallas":
    @jax.jit
    def f(mask, pay):
        def a(_):
            idx, cnt, packed = compact_best(mask, [pay])
            return idx.view(jnp.int32), cnt
        def b(_):
            return jnp.zeros((N,), jnp.int32), jnp.int32(0)
        return lax.cond(mask[0], a, b, jnp.int32(0))
    r = f(mask, pay)
    print("cond_pallas ok", int(r[1]))
elif mode == "plain_pallas":
    @jax.jit
    def f(mask, pay):
        idx, cnt, packed = compact_best(mask, [pay])
        return idx.view(jnp.int32), cnt
    r = f(mask, pay)
    print("plain_pallas ok", int(r[1]))
elif mode == "join_small":
    from gandiva_tpu.ops.hash_join import join
    probe = jnp.asarray(np.random.default_rng(1).integers(0, 1000, N).astype(np.int64))
    build = jnp.arange(1000, dtype=jnp.int64)
    res = jax.jit(lambda p,b: join(p, b, N, "inner"))(probe, build)
    print("join_small ok", int(res.count))
