import time
import jax, jax.numpy as jnp

from gandiva_tpu.ops.sort import SortKey, sort_columns

@jax.jit
def run(keys, payload):
    perm, sk, sp = sort_columns([SortKey(keys)], [payload])
    return sk[0][0] + sp[0][-1] + perm.astype(jnp.int64)[0]

n = 100_000_000
key = jax.random.PRNGKey(2)
keys = jax.random.randint(key, (n,), -(2**62), 2**62, dtype=jnp.int64)
payload = jax.random.randint(key, (n,), 0, 10**9, dtype=jnp.int64)
int(run(keys, payload))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    int(run(keys, payload))
    best = min(best, time.perf_counter() - t0)
print(f"sort bench: {best*1e3:.0f} ms ({n/best/1e6:.1f} Mrows/s)")

# correctness vs pyarrow at 4M
import numpy as np
import pyarrow.compute as pc
m = 4_000_000
k2, p2 = keys[:m], payload[:m]
perm, sk, sp = jax.jit(lambda a, b: sort_columns([SortKey(a)], [b]))(k2, p2)
import pyarrow as pa
idx = pc.sort_indices(pa.chunked_array([pa.array(np.asarray(k2))]))
exp = np.asarray(k2)[np.asarray(idx)]
print("keys ok:", np.array_equal(np.asarray(sk[0]), exp),
      "payload ok:", np.array_equal(np.asarray(sp[0]),
                                    np.asarray(p2)[np.asarray(idx)]),
      "perm ok:", np.array_equal(np.asarray(perm), np.asarray(idx)))
